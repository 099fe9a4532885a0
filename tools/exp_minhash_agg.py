"""A/B: minhash signature via the interpreted HOF fold (current) vs an
explode + 32-column min-aggregate formulation (whole-stage codegen,
map-side combine -> shuffle volume = one row per doc per partition).
Same affine permutations, same sentinel for empty shingle sets, so the
signatures must be IDENTICAL (asserted at sf0.01 before timing)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    _MERSENNE,
    _NPERM,
    minhash_signature,
    shingle_hashes,
    shingles,
)
from wod_ascii_to_parquet_spark_spark.registry import load
from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="mh-agg", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def sig_fold(d):
    return (
        d.select("doc_id", shingles(F.col("text")).alias("sh"))
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .select("doc_id", minhash_signature(F.col("hashes")).alias("sig"))
    )


def sig_agg(d):
    base = d.select("doc_id", shingles(F.col("text")).alias("sh"))
    h = base.select(
        "doc_id",
        F.explode(F.col("sh")).alias("s"),
    ).select(
        "doc_id", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE)).alias("h")
    )
    mins = h.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    (2 * p + 3) * F.col("h") + p * 1_000_003, F.lit(_MERSENNE)
                )
            ).alias(f"m{p}")
            for p in range(_NPERM)
        ]
    )
    sig = mins.select(
        "doc_id", F.array(*[f"m{p}" for p in range(_NPERM)]).alias("sig")
    )
    # docs with EMPTY shingle sets drop out of the explode; the fold
    # gives them the sentinel-init signature — restore it
    sentinel = F.array_repeat(F.lit(_MERSENNE).cast("bigint"), _NPERM)
    return (
        base.select("doc_id")
        .join(sig, "doc_id", "left")
        .select("doc_id", F.coalesce("sig", sentinel).alias("sig"))
    )


# equality gate at sf0.01
d0 = load(spark, "/root/testdata/sf0.01", "documents").select("doc_id", "text")
a = {(r.doc_id, tuple(r.sig)) for r in sig_fold(d0).collect()}
b = {(r.doc_id, tuple(r.sig)) for r in sig_agg(d0).collect()}
assert a == b and a, (len(a), len(b), len(a & b))
print("signatures identical at sf0.01:", len(a), flush=True)

for sf in ["/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1",
           "/root/repo/spark-warehouse/sf10"]:
    d = load(spark, sf, "documents").select("doc_id", "text")
    for label, fn in [("fold", sig_fold), ("agg", sig_agg)]:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(d).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print(
            {"sf": sf.rsplit("/", 1)[-1], "arm": label,
             "min": round(min(runs[1:]), 3),
             "runs": [round(r, 2) for r in runs]},
            flush=True,
        )
