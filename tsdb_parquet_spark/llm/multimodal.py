"""Multimodal column conventions — image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

North-star extension (SURVEY.md §2.2); not in the reference.

Conventions (the schema contract a 100 TB multimodal corpus table follows):

- payload: ``content BINARY`` (the encoded bytes, opaque to Spark);
- typed metadata struct ``meta: STRUCT<modality STRING, mime STRING,
  width INT, height INT, duration_ms BIGINT, sample_rate INT>`` — plain
  columns so min/max pruning and dictionary filtering work on them;
- derived features land in new columns, never mutate the payload.

The decode step itself needs image/audio libraries that are NOT in this
container, so it is STUBBED: ``decode_images(fake=True)`` produces a
deterministic fake (dimensions derived from a hash of the bytes) so the
Spark-side plumbing — schema, Arrow batching, partition sizing — is real
and testable; ``fake=False`` raises ``NotImplementedError`` where PIL would
be called.

Scale notes: ``mapInPandas`` streams Arrow batches (bounded memory per
task); binary payloads make *rows* huge, so cap
``spark.sql.files.maxPartitionBytes`` (128 MB default is fine) and never
``collect()`` payload columns.  Feature extraction is a map stage — no
shuffle.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("item_id", LongType(), nullable=False),
        StructField("content", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)


def make_multimodal_table(spark, docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Deterministic fake multimodal table derived from the documents
    fixture: payload = utf-8 bytes of the text, metadata synthesized from a
    hash.  Exercises the real schema/partitioning with fake bytes."""
    h = F.abs(F.xxhash64(text_col))
    return docs.select(
        F.col(id_col).alias("item_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("image/fake").alias("mime"),
            (h % 1920 + 1).cast("int").alias("width"),
            (F.abs(F.xxhash64(text_col, F.lit(1))) % 1080 + 1).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


_DECODED_SCHEMA = "item_id bigint, width int, height int, n_bytes bigint, checksum bigint"


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode the binary payload into (width, height, bytes, checksum).

    ``fake=True``: deterministic stand-in (no image libs in this container)
    — dimensions from a byte-hash, checksum = sum of bytes.  ``fake=False``
    is where ``PIL.Image.open(io.BytesIO(b))`` would run; it raises
    ``NotImplementedError`` here by design.

    The plumbing is the real pattern: Arrow-batched ``mapInPandas``, bounded
    batch memory, schema declared up front.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in this container"
                )
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    # zlib.crc32, not hash(): builtin hash is SipHash salted
                    # by PYTHONHASHSEED — seed-independent digest makes the
                    # fake structurally deterministic across environments
                    "width": [(zlib.crc32(bytes(b)) & 0x7FF) + 1 for b in contents],
                    "height": [((zlib.crc32(bytes(b)) >> 11) & 0x7FF) + 1 for b in contents],
                    "n_bytes": [len(b) for b in contents],
                    "checksum": [int(sum(bytes(b)) & 0x7FFFFFFF) for b in contents],
                }
            )

    return df.select("item_id", "content").mapInPandas(_decode, schema=_DECODED_SCHEMA)


def resize_images(df: DataFrame, max_dim: int = 256, fake: bool = True) -> DataFrame:
    """Resize payloads to fit ``max_dim`` (aspect-preserving).  Fake mode
    recomputes target dimensions from the decode stub's fake dims and
    passes bytes through; ``fake=False`` is where PIL's ``thumbnail``
    would run.  Same Arrow-batched mapInPandas plumbing as decode."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL/libvips — not in this container"
                )
            out_w, out_h, content = [], [], []
            for b in pdf["content"]:
                bb = bytes(b)
                w = (zlib.crc32(bb) & 0x7FF) + 1
                h = ((zlib.crc32(bb) >> 11) & 0x7FF) + 1
                scale = min(1.0, max_dim / max(w, h))
                out_w.append(max(1, int(w * scale)))
                out_h.append(max(1, int(h * scale)))
                content.append(bb)  # fake: bytes unchanged
            yield pd.DataFrame(
                {"item_id": pdf["item_id"], "content": content,
                 "width": out_w, "height": out_h}
            )

    return df.select("item_id", "content").mapInPandas(
        _resize, schema="item_id bigint, content binary, width int, height int"
    )


def extract_features(df: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Feature-extract payloads into a ``dim``-length float vector — the
    embedding hop of a multimodal pipeline.  Fake mode derives a
    deterministic pseudo-embedding from a rolling byte hash so downstream
    similarity plumbing (llm/similarity.py) is exercisable end-to-end;
    ``fake=False`` is where a vision model would run (batch inference per
    Arrow batch — exactly this mapInPandas shape, which is why the stub
    keeps it)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision model — not in this container"
                )
            feats = []
            for b in pdf["content"]:
                bb = bytes(b)
                h = 1469598103934665603  # FNV-1a rolling over bytes
                vec = []
                for i in range(dim):
                    for byte in bb[i::dim] or b"\x00":
                        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
                    vec.append(((h >> 11) % 2_000_001 - 1_000_000) / 1_000_000.0)
                feats.append(vec)
            yield pd.DataFrame({"item_id": pdf["item_id"], "embedding": feats})

    return df.select("item_id", "content").mapInPandas(
        _extract, schema="item_id bigint, embedding array<double>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps (0, every_ms, ...) without decoding — the real decode of each
    frame is the stubbed mapInPandas above.  Shows the explode-side shape:
    one row per (item, frame_ts), partition-parallel."""
    n_frames = F.coalesce(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(0)
    )
    return df.select(
        "item_id",
        F.explode(
            F.when(n_frames > 0, F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms)))
            .otherwise(F.array().cast("array<int>"))
        ).alias("frame_ts_ms"),
    )
