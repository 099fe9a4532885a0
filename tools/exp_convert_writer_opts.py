"""Writer-side knobs for the 1652-tiny-file convert write: dictionary
on/off, page-size floor, and task counts at full warmth (directive #5)."""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convopts", master="local[32]", shuffle_partitions=32)

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


def run(opts, n_tasks=16):
    out = tempfile.mkdtemp(prefix="convo_")
    try:
        w = (
            casts_df()
            .repartition(n_tasks, F.col("geohash3"))
            .sortWithinPartitions("geohash3", "geohash")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
        )
        for k, v in opts.items():
            w = w.option(k, v)
        w.partitionBy("geohash3").parquet(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)


# long warmup to full JIT
for _ in range(5):
    run({})

cases = [
    ("base16", {}, 16),
    ("nodict", {"parquet.enable.dictionary": "false"}, 16),
    ("smallpage", {"parquet.page.size": 65536, "parquet.block.size": 1048576}, 16),
    ("tasks24", {}, 24),
    ("tasks32", {}, 32),
]
for label, opts, n in cases:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(opts, n)
        runs.append(time.perf_counter() - t0)
    print({label: [round(r, 3) for r in runs], "min": round(min(runs), 3)}, flush=True)
