"""Directive r7->r8 #6: measure whether an explicit persist() on the
prepared (doc_id, sh, sig) frame beats the current Exchange-barrier shape
in dedup_minhash_lsh (SCALE.md: per-branch pruning defeats ReuseExchange,
so the cheap shingle concat computes ~2x). Runs both arms at sf0.1 and
sf1, 1 warm + min of 2, cache cleared between runs."""

from __future__ import annotations

import time

from pyspark import StorageLevel
from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    _lsh_verified_pairs,
    minhash_signature,
    shingle_hashes,
    shingles,
)


def prepared(spark, sf_dir):
    d = spread(load(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", shingles(F.col("text")).alias("sh"))
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
    )


def arm_barrier(spark, sf_dir):
    s = prepared(spark, sf_dir).repartition(F.col("doc_id"))
    return _lsh_verified_pairs(s)


def arm_persist(spark, sf_dir):
    s = prepared(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    return _lsh_verified_pairs(s)


def measure(fn, spark, sf_dir, runs=2):
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
    # JVM/codegen warmup outside the measurement: one full pass of each arm.
    for fn in (arm_barrier, arm_persist):
        fn(spark, "/root/testdata/sf0.1").count()
        spark.catalog.clearCache()
    for sf_dir in ("/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1"):
        for name, fn in (
            ("barrier", arm_barrier),
            ("persist", arm_persist),
            ("barrier2", arm_barrier),
            ("persist2", arm_persist),
        ):
            t, n = measure(fn, spark, sf_dir, runs=3)
            print({"sf": sf_dir.rsplit("/", 1)[-1], "arm": name, "sec": round(t, 3), "rows": n}, flush=True)


if __name__ == "__main__":
    main()
