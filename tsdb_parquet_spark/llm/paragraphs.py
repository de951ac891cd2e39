"""Segment-level (paragraph/line) corpus cleaning — the CCNet-style
pass that removes BOILERPLATE repeated across documents (headers,
footers, nav bars, cookie banners) before any document-level dedup
runs: a segment that appears in many documents is template, not
content.

Reference pipelines (CCNet, Wenzek et al. 2020; Gopher's repetition
filters; RefinedWeb) do this at the paragraph/line level on newline-
delimited web text.  The operators here take the segmentation as a
first-class input:

- :func:`segment_documents` splits on a delimiter regex (newlines for
  web text) — each segment keeps its position so documents can be
  reconstructed in order;
- for corpora without natural delimiters, any (id, seg_id, seg_text)
  table works — e.g. ``llm/text.chunk_documents(overlap=0)`` renamed,
  which is what the driver query uses on the synthetic fixture.

100 TB shape (per function docstrings): segmentation is a pure map
stage; the cross-document frequency is one partial-combining aggregate
on the segment HASH (never shipping segment text into the exchange);
the filter joins back on that hash; reconstruction is one (doc)
exchange with an order-carrying array_sort — no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_documents(
    df: DataFrame,
    delimiter: str = r"\n\n+",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into position-numbered segments on a
    delimiter regex (paragraphs on blank lines by default).  Empty
    segments (leading/trailing/double delimiters) are dropped but
    positions keep the original order, so reconstruction preserves it.

    Scale: split + posexplode — JVM codegen map stage, zero shuffle.
    """
    parts = F.split(F.col(text_col), delimiter)
    return (
        df.select(F.col(id_col), F.posexplode(parts).alias("seg_id", "seg_text"))
        .filter(F.col("seg_text") != "")
    )


def boilerplate_strip(
    segments: DataFrame,
    max_docs: int = 2,
    id_col: str = "doc_id",
    seg_id_col: str = "seg_id",
    seg_text_col: str = "seg_text",
    joiner: str = " ",
) -> DataFrame:
    """Remove segments whose EXACT text occurs in more than ``max_docs``
    distinct documents, then reconstruct each document from its
    surviving segments in position order.  Output: one row per document
    that retains at least one segment — (id, n_segments kept,
    n_dropped, cleaned text).

    Exactness: duplicate detection is on the md5 of the segment text
    (the sampling family's portable-digest convention), distinct-doc
    counting is exact, and reconstruction joins surviving segments with
    ``joiner`` in ``seg_id`` order — bit-stable across engines.

    100 TB shape: (1) the frequency pass aggregates on ``md5(seg)`` —
    a 32-byte key — with a partial-combining ``count_distinct``-free
    form (collapse to distinct (hash, doc) first, then count), so the
    exchange never carries segment text or per-occurrence rows;
    (2) the boilerplate set (hashes seen in > max_docs docs) is a
    template-sized table marked onto the segments by one hash join
    (broadcast when small, AQE decides); (3) kept-count, dropped-count
    and the reconstruction all come out of ONE (doc) exchange —
    ``collect_list`` skips nulls, so ``collect_list(when(not boiler,
    struct(pos, text)))`` gathers exactly the survivors, sorted and
    joined after the aggregate.  Per-doc state is bounded by document
    size, the same bound any per-doc operator has.  No window
    functions, no driver collects.
    """
    seg = segments.select(
        F.col(id_col),
        F.col(seg_id_col).alias("_sid"),
        F.col(seg_text_col).alias("_stxt"),
        F.md5(F.col(seg_text_col)).alias("_sh"),
    )
    # distinct (hash, doc) -> per-hash doc counts: both aggregates
    # partial-combine; the second one's input is already collapsed
    freq = (
        seg.select("_sh", id_col).distinct()
        .groupBy("_sh")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
    )
    boiler = freq.filter(F.col("_ndocs") > max_docs).select(
        "_sh", F.lit(True).alias("_bp")
    )
    marked = seg.join(boiler, "_sh", "left")
    bp = F.coalesce(F.col("_bp"), F.lit(False))
    return (
        marked.groupBy(id_col)
        .agg(
            F.sum(F.when(~bp, 1).otherwise(0)).alias("n_segments"),
            F.sum(F.when(bp, 1).otherwise(0)).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~bp, F.struct("_sid", "_stxt"))
                        )
                    ),
                    lambda s: s["_stxt"],
                ),
                joiner,
            ).alias("clean_text"),
        )
        .filter(F.col("n_segments") > 0)
        .select(id_col, "n_segments", "n_dropped", "clean_text")
    )
