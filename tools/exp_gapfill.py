"""Directive r7->r8 #4: events_resample_gapfill root cause + one-scan rework.

Current plan scans `events` 3x (bounds agg, distinct types, hourly agg).
Rework: compute the tiny hourly aggregate once, persist it, derive bounds
and types FROM it (date_trunc is monotonic so min/max commute with it).
Measure both at sf0.1 and sf1, plus verify identical results."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load, load_all_operators


def reworked(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = (
        e.groupBy(F.col("event_type").alias("h_type"), hour.alias("h_hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .persist()
    )
    bounds = hourly.agg(F.min("h_hour").alias("lo"), F.max("h_hour").alias("hi"))
    types = hourly.select(F.col("h_type").alias("event_type")).distinct()
    grid = types.join(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return grid.join(
        hourly,
        (F.col("event_type") == F.col("h_type")) & (F.col("hour") == F.col("h_hour")),
        "left",
    ).select(
        "event_type",
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.last(F.col("avg_value"), ignorenulls=True).over(w).alias("avg_value_ff"),
    )


def measure(fn, spark, sf_dir, runs=3):
    times = []
    for i in range(runs + 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    spark.catalog.clearCache()
    return min(times), n


def main():
    spark = get_spark()
    queries = load_all_operators()
    current = queries["events_resample_gapfill"].fn
    # parity check at sf0.1
    a = current(spark, "/root/testdata/sf0.1").sort("event_type", "hour").collect()
    b = reworked(spark, "/root/testdata/sf0.1").sort("event_type", "hour").collect()
    print({"parity": a == b, "rows": len(a)}, flush=True)
    spark.catalog.clearCache()
    for sf_dir in ("/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1"):
        for name, fn in (("current", current), ("reworked", reworked)):
            t, n = measure(fn, spark, sf_dir)
            print({"sf": sf_dir.rsplit("/", 1)[-1], "arm": name, "sec": round(t, 3), "rows": n}, flush=True)


if __name__ == "__main__":
    main()
