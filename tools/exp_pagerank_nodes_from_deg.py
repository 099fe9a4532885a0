"""Round-16 A/B for graph_pagerank's one-time graph build: derive the
node set (and N) from ``deg`` — which already holds exactly one row per
src — instead of ``distinct()`` over the cached |edges|-sized frame.

CUR: nodes = ew.select(src).distinct(); n = nodes.count()
     (a hash-agg exchange over the cached edge list, evaluated twice:
      once for the count action, once in the ranks-init subtree)
NEW: nodes = ew.select(src, outdeg).dropDuplicates? no — deg itself:
     the cached frame keeps (src, dst, outdeg); one row per src exists
     in deg, so nodes = deg.select(src AS id) and n = that frame's
     count — but deg is UPSTREAM of the cache, so the count would
     re-run the edge build. Instead: first materialize the cache with
     ew.count() (needed anyway), then distinct over the cache for
     nodes... i.e. the candidates are:

    A (registered): nodes.count() materializes cache + distinct agg;
      ranks init re-runs the distinct over the cache.
    B: max-of-deg trick — nodes = ew.groupBy("src").agg(first outdeg)?
      still an agg. Simplest real alternative measured here: persist
      the small nodes frame too, so the distinct agg runs ONCE (its
      count materializes both caches), and ranks init reads it.

Results asserted identical; wall + JVM CPU, interleaved.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.operators.graph import (
    _DAMP,
    _SCALE,
    _TELEPORT,
)
from wod_ascii_to_parquet_spark_spark.registry import load, load_all_operators
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="pagerank-nodes-ab", master="local[32]",
                  shuffle_partitions=32)
qs = load_all_operators()


def pr_cur():
    return qs["graph_pagerank"].fn(spark, SF)


def pr_nodes_cached():
    pairs = (
        load(spark, SF, "lineitem")
        .join(load(spark, SF, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select((F.col("l_suppkey") * 2).alias("s"),
                (F.col("o_custkey") * 2 + 1).alias("c"))
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")) \
        .unionAll(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src").repartition("src").persist()
    nodes = ew.select(F.col("src").alias("id")).distinct().persist()
    n_val = nodes.count()
    base = math.floor(_SCALE / n_val)
    teleport = math.floor(_TELEPORT / n_val)
    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            ew.join(ranks, F.col("src") == F.col("id"))
            .groupBy("dst")
            .agg(F.sum(F.floor(F.col("r").cast("double") / F.col("outdeg"))
                       ).alias("m"))
        )
        ranks = contrib.select(
            F.col("dst").alias("id"),
            (F.lit(teleport) + F.floor(F.lit(_DAMP) * F.col("m")))
            .cast("bigint").alias("r"),
        )
    return (
        ranks.select("id", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "id")
        .limit(50)
    )


def timeit(tag, mk):
    spark.catalog.clearCache()
    # fn() runs the graph-build count action — keep it INSIDE the timed
    # region (the bench protocol times fn + sink)
    t0, c0 = time.perf_counter(), jvm_cpu()
    mk().write.format("noop").mode("overwrite").save()
    w, c = time.perf_counter() - t0, jvm_cpu() - c0
    print(f"{tag:14s} wall {w:7.3f}  cpu {c:7.2f}", flush=True)
    return w, c


spark.catalog.clearCache()
a = pr_cur().collect()
spark.catalog.clearCache()
b = pr_nodes_cached().collect()
assert [tuple(r) for r in a] == [tuple(r) for r in b], "variants differ!"
print("identity OK,", len(a), "rows", flush=True)

res = {}
for rnd in range(ROUNDS):
    for tag, mk in (("cur", pr_cur), ("nodes_cached", pr_nodes_cached)):
        res.setdefault(tag, []).append(timeit(tag, mk))

for tag, vals in res.items():
    print(f"== {tag:14s} MIN wall {min(w for w, _ in vals):7.3f} "
          f"cpu {min(c for _, c in vals):7.2f}")
