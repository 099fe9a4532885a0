"""Split convert's write_job cost: decode-only (noop sink) vs parquet
write under snappy/zstd/uncompressed/none, warm session (directive #5)."""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convwrite", master="local[32]", shuffle_partitions=32)

from wod_ascii_to_parquet_spark_spark.plans.convert import _geometry_col
from wod_ascii_to_parquet_spark_spark.sources.wod_ascii import ok_casts, wod_scan
from wod_ascii_to_parquet_spark_spark.functions.geohash import geohash_col

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"


def casts_df():
    parsed = wod_scan(spark, SRC, dataset="XBT", scatter=True)
    seconds = (F.col("time") * 3600).cast("int")
    return (
        ok_casts(parsed)
        .withColumn(
            "castTimestamp",
            F.try_add(
                F.expr(
                    "try_to_timestamp(concat(year, '-', lpad(month, 2, '0'), "
                    "'-', lpad(day, 2, '0')))"
                ),
                F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), seconds),
            ),
        )
        .withColumn("geohash", geohash_col("latitude", "longitude"))
        .withColumn("geohash3", F.substring("geohash", 1, 3))
        .withColumn("geometry", _geometry_col("point"))
    )


def run_noop():
    casts_df().write.format("noop").mode("overwrite").save()


def run_parquet(codec):
    out = tempfile.mkdtemp(prefix=f"convw_{codec}_")
    try:
        (
            casts_df()
            .repartition(16, F.col("geohash3"))
            .sortWithinPartitions("geohash3", "geohash")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .option("compression", codec)
            .partitionBy("geohash3")
            .parquet(out)
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


# warmup
for _ in range(3):
    run_noop()
for _ in range(2):
    run_parquet("snappy")

for label, fn in [
    ("decode_noop", run_noop),
    ("pq_snappy", lambda: run_parquet("snappy")),
    ("pq_zstd", lambda: run_parquet("zstd")),
    ("pq_none", lambda: run_parquet("none")),
]:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    print({label: [round(r, 3) for r in runs], "min": round(min(runs), 3)}, flush=True)
