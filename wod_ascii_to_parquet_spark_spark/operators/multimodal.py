"""Multimodal-column plumbing (driver contract: image/audio/video as opaque
``binary`` + typed metadata).

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes / clearly-marked stubs — but everything Spark-side is
real and tested: binary columns, metadata structs, Arrow-batched
``mapInPandas`` UDF signatures, per-batch processing shape, and the
explode-style frame sampling plan.

Scale notes (100 TB of media):
- Blobs ride in parquet binary columns; metadata lives in sibling struct
  columns so planning-time predicates (format, size, dims) prune row groups
  WITHOUT touching blob bytes (column pruning keeps the binary column
  unread until the decode stage).
- Decode runs in ``mapInPandas`` so each Arrow batch amortizes Python
  transfer; batch size is bounded by bytes not rows
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` + input split sizing).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register

#: Set True only where a real codec (PIL/ffmpeg/...) is installed.
REAL_CODECS_AVAILABLE = False


def _with_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded as an opaque binary column + typed metadata —
    the canonical multimodal row shape."""
    d = load(spark, sf_dir, "documents")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("wav")
    )
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("blob"),
        F.struct(
            fmt.alias("fmt"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
        ).alias("meta"),
    )


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'wav' END AS fmt,
           CAST(n_chars % 640 AS INT) AS width,
           CAST(n_chars % 480 AS INT) AS height
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over binary+struct columns — planner never reads
    blob bytes for this query (column pruning; asserted in test_plans)."""
    b = _with_blob(spark, sf_dir)
    return b.select(
        "doc_id",
        F.octet_length("blob").alias("n_bytes"),
        F.col("meta.fmt").alias("fmt"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def decode_blob_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-Arrow-batch decode kernel. Real codec path is stubbed (no
    PIL/ffmpeg in this environment); the fake path derives deterministic
    features from the raw bytes so the full Spark plumbing is testable."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image/audio decode requires PIL/ffmpeg")
    blobs = batch["blob"]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bytes": blobs.map(len).astype("int64"),
            "mean_byte": blobs.map(
                lambda b: float(sum(b)) / len(b) if len(b) else 0.0
            ),
            "first_byte": blobs.map(lambda b: int(b[0]) if len(b) else -1),
        }
    )


@register("multimodal_decode_stub", None, tags=("multimodal", "rows-only"))
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature-extract over the blob column via
    ``mapInPandas`` — the real multimodal execution shape with a
    deterministic fake kernel (see ``decode_blob_batch``)."""
    b = _with_blob(spark, sf_dir).select("doc_id", "blob")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield decode_blob_batch(batch)

    return b.mapInPandas(
        run, "doc_id bigint, n_bytes bigint, mean_byte double, first_byte int"
    )


def _int_be4(col) -> "F.Column":
    """int → 4-byte big-endian binary, as a Catalyst expression."""
    return F.unhex(F.lpad(F.hex(col), 8, "0"))


@register("multimodal_png_header", None, tags=("multimodal", "rows-only"))
def multimodal_png_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-level media handling: build a valid PNG signature + IHDR
    prefix (magic, length, type, width/height as big-endian u32) per
    document, then parse the dimensions back OUT of the raw bytes with
    binary substring + hex arithmetic. Everything is Catalyst expressions
    on binary columns — the exact shape of metadata extraction over image
    blobs at scale, minus only the pixel codec. Correctness is pinned
    against Python ``struct`` in tests/test_multimodal_bytes.py."""
    d = load(spark, sf_dir, "documents")
    width = (F.col("n_chars") % 640 + 1).cast("int")
    height = (F.col("n_chars") % 480 + 1).cast("int")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),  # IHDR length = 13
        F.col("ihdr_tag").cast("binary"),
        _int_be4(width),
        _int_be4(height),
        F.unhex(F.lit("0806000000")),  # bit depth + color type + filler
    )
    blobbed = d.withColumn("ihdr_tag", F.lit("IHDR")).select(
        "doc_id", png.alias("blob")
    )
    # parse back from raw bytes only
    parsed_w = F.conv(F.hex(F.expr("substring(blob, 17, 4)")), 16, 10).cast("int")
    parsed_h = F.conv(F.hex(F.expr("substring(blob, 21, 4)")), 16, 10).cast("int")
    is_png = F.hex(F.expr("substring(blob, 1, 8)")) == "89504E470D0A1A0A"
    return blobbed.select(
        "doc_id",
        F.octet_length("blob").alias("n_bytes"),
        is_png.cast("int").alias("is_png"),
        parsed_w.alias("width"),
        parsed_h.alias("height"),
    )


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(frame AS INT) AS frame_idx,
           CAST(frame * 100 AS BIGINT) AS byte_offset
    FROM (
        SELECT doc_id, unnest(range(0, CAST(floor(n_chars / 100) AS BIGINT))) AS frame
        FROM documents
        WHERE n_chars >= 100
    )
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame index
    (every 100 "duration units"), as a pure explode(sequence) — row
    generation stays JVM-side; the per-frame decode would then be the
    ``mapInPandas`` stage above."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    frames = F.explode(
        F.sequence(F.lit(0), (F.floor(F.col("n_chars") / 100) - 1).cast("int"))
    )
    return d.select("doc_id", frames.alias("frame")).select(
        "doc_id",
        F.col("frame").cast("int").alias("frame_idx"),
        (F.col("frame") * 100).cast("bigint").alias("byte_offset"),
    )
