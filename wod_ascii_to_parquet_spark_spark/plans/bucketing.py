"""Bucketed tables: the shuffle-elimination tool for repeated big⋈big joins.

At 100 TB, a fact⋈fact join shuffles both sides on every query. Writing both
sides bucketed (+ sorted) by the join key co-locates matching rows by
bucket file: Catalyst plans a sort-merge join with NO Exchange (and no Sort,
when ``sortBy`` matches) on either side. The write-side shuffle is paid
once, then every subsequent join on that key is shuffle-free — the batch
analogue of the reference's one-time ``repartition(geohash3)`` clustering
before its partitioned write (``DatasetYearTrain.java:131``).

Bucket count guidance: ≈ (table size / 128 MB) rounded to a power of two,
identical on both sides of the intended join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed parquet table."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. The ``merge`` hint
    pins sort-merge so the plan demonstrates exchange-free execution even
    when one side is broadcast-sized."""
    left = spark.table(left_table).hint("merge")
    right = spark.table(right_table)
    return left.join(right, key)
