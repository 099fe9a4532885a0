"""Round-16 A/B: bind the token array as a PROJECTED COLUMN before the
shingle HOF instead of capturing the raw split() subtree in the lambda.

Interpreted HOF lambdas re-evaluate every captured non-attribute subtree
per element — ``transform(seq, i -> array_join(slice(split(text), i, 3)))``
re-splits the whole text once per gram. Projecting ``toks = split(text)``
first makes the captured reference an AttributeReference (a row-field
read). CollapseProject keeps the extra projection because ``toks`` is
referenced more than once and split() is not cheap.

Variants asserted identical; wall + JVM CPU, interleaved.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    minhash_signature,
    shingle_hashes,
    shingles,
)
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="shingles-bind-toks", master="local[32]",
                  shuffle_partitions=32)


def base():
    return spread(load(spark, SF, "documents"))


def sh_cur():
    return base().select("doc_id", shingles(F.col("text")).alias("sh"))


def _sh_from(toks, k=3):
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )).otherwise(F.array().cast("array<string>"))


def sh_bound():
    b = base().select("doc_id", F.split("text", " ").alias("__toks"))
    return b.select("doc_id", _sh_from(F.col("__toks")).alias("sh"))


def chain(mk):
    return (
        mk()
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
    )


def timeit(tag, mk):
    spark.catalog.clearCache()
    df = mk()
    t0, c0 = time.perf_counter(), jvm_cpu()
    df.write.format("noop").mode("overwrite").save()
    w, c = time.perf_counter() - t0, jvm_cpu() - c0
    print(f"{tag:12s} wall {w:7.3f}  cpu {c:7.2f}", flush=True)
    return w, c


a = sh_cur().orderBy("doc_id").collect()
b = sh_bound().orderBy("doc_id").collect()
assert a == b, "shingle variants differ!"
print("identity OK over", len(a), "docs", flush=True)
print(sh_bound()._jdf.queryExecution().executedPlan().toString()[:1500])

res = {}
for rnd in range(ROUNDS):
    for tag, mk in (
        ("sh_cur", sh_cur),
        ("sh_bound", sh_bound),
        ("chain_cur", lambda: chain(sh_cur)),
        ("chain_bound", lambda: chain(sh_bound)),
    ):
        res.setdefault(tag, []).append(timeit(tag, mk))

for tag, vals in res.items():
    print(f"== {tag:12s} MIN wall {min(w for w, _ in vals):7.3f} "
          f"cpu {min(c for _, c in vals):7.2f}")
