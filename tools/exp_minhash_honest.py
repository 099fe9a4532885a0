"""Honest (cache-cleared) one-shot A/B of the LSH shingle barrier:
persist (current) vs repartition Exchange (r7 shape), sf0.1 + sf1."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators, load, spread

spark = get_spark(app_name="mhbar", master="local[32]", shuffle_partitions=32)
load_all_operators()

from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    _lsh_verified_pairs,
    minhash_signature,
    shingle_hashes,
    shingles,
)


def lsh(sf_dir: str, barrier: str):
    d = spread(load(spark, sf_dir, "documents"))
    s = (
        d.select("doc_id", shingles(F.col("text")).alias("sh"))
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
    )
    s = s.persist() if barrier == "persist" else s.repartition(F.col("doc_id"))
    return _lsh_verified_pairs(s)


for sf in ["/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1"]:
    for barrier in ["persist", "repartition"]:
        runs = []
        for _ in range(4):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            lsh(sf, barrier).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print({"sf": sf.rsplit("/",1)[-1], "barrier": barrier,
               "runs": [round(r,2) for r in runs],
               "min": round(min(runs), 3)}, flush=True)
