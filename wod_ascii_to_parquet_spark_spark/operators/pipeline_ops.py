"""Scan / filter / projection / per-record-transform operators (SURVEY §2.1–2.2).

These mirror the reference's actual pipeline shapes on the synthetic tables:
- P1 ``filter_suffix``  — key filter ``endsWith(".gz") OR in subset``
  (``DatasetTrain.java:73-86``).
- P2 ``project_rename`` — output-name derivation: last path segment,
  ``.gz``→``.parquet``, ``SURF_ALL``→``SUR_ALL``
  (``DatasetYearTrain.java:224-237``).
- P3 ``project_prefix3`` — 3-char prefix partition key (the ``geohash3``
  derivation consumed at ``DatasetYearTrain.java:131,136``).
- P4 ``transform_per_record`` — per-record transform with an error
  side-channel as a tagged-union split (``DatasetYearTrain.java:182-193`` +
  ``TransformationErrorHandler.java:30-40``), done as ONE distributed pass —
  never a driver loop, never one write per bad record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "parquet_scan",
    """
    SELECT l_orderkey, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity < 10.0
    """,
    tags=("scan",),
)
def parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar parquet scan with predicate pushdown + column pruning: the
    filter lands in ``PushedFilters`` and ReadSchema carries only 4 of 11
    columns (verified in tests/test_plans.py)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_quantity") < 10.0)
        )
        .select("l_orderkey", "l_extendedprice", "l_shipdate")
    )


def _paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize reference-shaped object keys from ``documents``:
    ``<source>/<DS>/OBS/<name>.<ext>`` — SURF_ALL every 10th doc, ``.txt``
    (non-matching suffix) every 7th."""
    d = load(spark, sf_dir, "documents")
    name = F.when(F.col("doc_id") % 10 == 0, F.lit("SURF_ALL")).otherwise(
        F.concat(F.lit("DOC"), F.col("doc_id").cast("string"))
    )
    ext = F.when(F.col("doc_id") % 7 == 0, F.lit(".txt")).otherwise(F.lit(".gz"))
    return d.select(
        "doc_id",
        F.concat_ws(
            "/", F.col("source"), F.lit("WOD"), F.lit("OBS"), F.concat(name, ext)
        ).alias("path"),
    )


_PATHS_SQL = """
    SELECT doc_id,
           concat_ws('/', source, 'WOD', 'OBS',
               concat(CASE WHEN doc_id % 10 = 0 THEN 'SURF_ALL'
                           ELSE concat('DOC', CAST(doc_id AS VARCHAR)) END,
                      CASE WHEN doc_id % 7 = 0 THEN '.txt' ELSE '.gz' END)) AS path
    FROM documents
"""


@register(
    "filter_suffix",
    f"""
    WITH paths AS ({_PATHS_SQL})
    SELECT doc_id, path FROM paths
    WHERE path LIKE '%.gz' OR path LIKE '%/DOC49.txt'
    """,
    tags=("filter",),
)
def filter_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-reduced suffix predicate (``DatasetTrain.java:73-86``): default
    ``.gz`` filter plus explicit subset names."""
    p = _paths(spark, sf_dir)
    return p.filter(
        F.col("path").endswith(".gz") | F.col("path").endswith("/DOC49.txt")
    )


@register(
    "project_rename",
    f"""
    WITH paths AS ({_PATHS_SQL})
    SELECT doc_id,
           replace(regexp_replace(string_split(path, '/')[-1], '\\.gz$', '.parquet'),
                   'SURF_ALL', 'SUR_ALL') AS out_name
    FROM paths
    """,
    tags=("projection",),
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-name derivation (``DatasetYearTrain.java:224-237``): last path
    segment, ``.gz``→``.parquet``, SUR special-case rename
    (``DatasetYearTrain.java:39-40,231-233``)."""
    p = _paths(spark, sf_dir)
    leaf = F.element_at(F.split(F.col("path"), "/"), -1)
    return p.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(leaf, r"\.gz$", ".parquet"), "SURF_ALL", "SUR_ALL"
        ).alias("out_name"),
    )


@register(
    "project_prefix3",
    "SELECT doc_id, substring(md5(text), 1, 3) AS bucket3 FROM documents",
    tags=("projection",),
)
def project_prefix3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-char prefix partition key — the ``geohash3 = substr(geohash, 1, 3)``
    shape (consumed ``DatasetYearTrain.java:131,136``), here over an md5 so
    both engines agree byte-for-byte."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.substring(F.md5(F.col("text").cast("binary")), 1, 3).alias("bucket3")
    )


@register(
    "transform_per_record",
    """
    WITH raw AS (
        SELECT event_id,
               CASE WHEN event_id % 97 = 0 THEN concat('x', props) ELSE props END
                   AS payload
        FROM events
    )
    SELECT event_id,
           CASE WHEN json_valid(payload) THEN 'ok' ELSE 'err' END AS status,
           CASE WHEN json_valid(payload)
                THEN CAST(json_extract_string(payload, '$.k') AS INT) END AS k_value,
           CASE WHEN NOT json_valid(payload) THEN 'malformed json' END AS error
    FROM raw
    """,
    tags=("transform",),
)
def transform_per_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged-union per-record transform: one distributed pass emits both the
    ok-channel and the error-channel (dataset/castNumber/error shape,
    ``CastError.java:16-22``). The reference ran this per record on the
    driver with a 1-row parquet write per failure
    (``TransformationErrorHandler.java:34-39``) — O(rows) Spark jobs; this
    is O(1) jobs at any scale."""
    ev = load(spark, sf_dir, "events")
    # Corrupt at the FIRST byte: Spark's Jackson parser tolerates trailing
    # junk after a complete JSON value, so a suffix corruption would not
    # round-trip through the error channel consistently with DuckDB.
    payload = F.when(
        F.col("event_id") % 97 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    # PERMISSIVE from_json yields a struct of nulls on malformed input; the
    # explicit corrupt-record column is the reliable malformed-row tag.
    parsed = F.from_json(
        payload,
        "k INT, _corrupt STRING",
        {"columnNameOfCorruptRecord": "_corrupt"},
    )
    ok = parsed["_corrupt"].isNull()
    return ev.select(
        "event_id",
        F.when(ok, "ok").otherwise("err").alias("status"),
        F.when(ok, parsed["k"]).alias("k_value"),
        F.when(~ok, "malformed json").alias("error"),
    )
