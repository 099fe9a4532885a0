"""Round-16 A/B: full-query CPU impact of the shingles() lambda body
(slice+array_join vs concat_ws of k element_at) on dedup_minhash_lsh.

Monkeypatches wod_ascii_to_parquet_spark_spark.operators.dedup.shingles
between variants in ONE session so runs interleave under identical host
weather. Results asserted identical before timing. JVM CPU seconds is
the decision metric (wall at sf0.1/local[32] hides per-task CPU behind
32-way parallelism; at 100 TB the fleet is CPU-throughput-bound).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.operators import dedup
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="shingles-fullquery-ab", master="local[32]",
                  shuffle_partitions=32)
qs = load_all_operators()


def shingles_concat(text, k: int = 3):
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        )
    )).otherwise(F.array().cast("array<string>"))


def shingles_slice(text, k: int = 3):
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    )).otherwise(F.array().cast("array<string>"))


QUERY = "dedup_minhash_lsh"


def run(variant):
    dedup.shingles = variant
    spark.catalog.clearCache()
    t0, c0 = time.perf_counter(), jvm_cpu()
    qs[QUERY].fn(spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0, jvm_cpu() - c0


# identity check
dedup.shingles = shingles_concat
spark.catalog.clearCache()
a = sorted(map(tuple, qs[QUERY].fn(spark, SF).collect()))
dedup.shingles = shingles_slice
spark.catalog.clearCache()
b = sorted(map(tuple, qs[QUERY].fn(spark, SF).collect()))
assert a == b, "variants differ!"
print(f"identity OK, {len(a)} rows", flush=True)

res = {"concat": [], "slice": []}
for rnd in range(ROUNDS):
    for tag, v in (("concat", shingles_concat), ("slice", shingles_slice)):
        w, c = run(v)
        res[tag].append((w, c))
        print(f"r{rnd} {tag:7s} wall {w:6.3f}  cpu {c:6.2f}", flush=True)

for tag, vals in res.items():
    print(f"== {tag:7s} MIN wall {min(w for w, _ in vals):6.3f} "
          f"cpu {min(c for _, c in vals):6.2f}")
pairwise = sum(
    1 for (_, ca), (_, cb) in zip(res["concat"], res["slice"]) if cb < ca
)
print(f"pairwise slice<concat (cpu): {pairwise}/{ROUNDS}")
