"""Incremental corpus ingestion — dedup a NEW batch against the
existing corpus WITHOUT rescanning or reshuffling the corpus.

At 100 TB the corpus-side cost is the whole game: a daily increment is
GBs, the at-rest corpus is the 100 TB.  The index here is a BUCKETED
at-rest table of content fingerprints (``llm/text.doc_fingerprint``'s
md5-prefix digest — engine-portable, join-key-grade), bucketed on the
fingerprint so the dedup anti-join consumes the at-rest bucket
partitioning: the only exchange in the plan is the (small) batch side
shuffling to match the index's buckets; the corpus side is a bucketed
scan with NO Exchange (plan-asserted in tests).  The index also prunes:
an indexed lookup of specific fingerprints reads only the buckets they
hash to (``SelectedBucketsCount``), the BM25 postings pattern
(`llm/ranking.py`) applied to dedup.

This composes with the rest of the dedup family: exact first (here),
then MinHash/SimHash/SemDeDup on the survivors — the standard pipeline
order (cheapest filter first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint_index_name(name: str) -> str:
    return f"{name}_fpidx"


def ensure_fingerprint_index(
    spark: SparkSession,
    name: str,
    build_docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    source_paths: str | list[str] | None = None,
) -> DataFrame:
    """Idempotent at-rest fingerprint index of a corpus: one
    (fingerprint, id) row per document, hash-bucketed AND sorted on the
    fingerprint (``sources.ensure_bucketed_table`` — fingerprint-named
    staleness, catalog/DDL/write resolution).  The ONE write-time
    shuffle amortizes over every subsequent increment."""
    from ..sources import ensure_bucketed_table
    from .text import doc_fingerprint

    def _build():
        return doc_fingerprint(build_docs(), id_col=id_col, text_col=text_col)

    return ensure_bucketed_table(
        spark,
        fingerprint_index_name(name),
        _build,
        bucket_col="fingerprint",
        num_buckets=num_buckets,
        sort_col="fingerprint",
        source_paths=source_paths,
    )


def incremental_dedup(
    index: DataFrame,
    batch_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> DataFrame:
    """Rows of ``batch_df`` whose normalized content is NOT already in
    the corpus index — the accept-set of an incremental ingest.  Exact
    semantics: same digest as the index (md5-prefix over
    lowercase/collapsed-whitespace text), anti-join on the fingerprint.

    The batch also self-dedups (keep the lowest-id row per
    fingerprint, one ``min_by`` aggregate): two copies of a new
    document in one increment admit one of them, so replaying increment
    order never double-admits.

    Shape — ONE exchange total, on the batch side: the fingerprint is
    a map-stage column on the batch (no join-back); the batch is
    repartitioned ONCE to the index's bucket count on the fingerprint
    (``num_buckets`` must match the index — pinning it up front lets
    both the anti-join and the self-dedup aggregate consume the same
    partitioning, where an ENSURE_REQUIREMENTS exchange pair would
    otherwise appear at bucket-count/shuffle-partition mismatches); the
    anti-join consumes the index's at-rest bucketing (corpus side: no
    Exchange — plan-asserted)."""
    from .text import fingerprint_col

    batch = batch_df.withColumn(
        "fingerprint", fingerprint_col(text_col)
    ).repartition(num_buckets, "fingerprint")
    # hint("merge"): at test scale Catalyst would BROADCAST the tiny
    # index, hiding the layout's point — at 100 TB the index is
    # billions of rows and the merge join consuming its at-rest buckets
    # (no corpus-side Exchange, no corpus-side sort) is the only shape
    # that survives; the q09_bucketed lesson applied to dedup
    fresh = batch.join(
        index.select("fingerprint").hint("merge"), "fingerprint", "left_anti"
    )
    keep = F.min_by(F.struct(*batch_df.columns), F.col(id_col))
    return (
        fresh.groupBy("fingerprint")
        .agg(keep.alias("_r"))
        .select("_r.*", "fingerprint")
    )
