"""A/B: pre-sort the PageRank edge cache so per-iteration SMJ sorts vanish.

`graph_pagerank` caches the static graph `repartition("src").persist()`;
the InMemoryRelation advertises hashpartitioning(src) so the per-iteration
rank join needs no edge-side Exchange — but NOT a sort order, so every
iteration's SortMergeJoin re-sorts the full cached edge frame (3 sorts of
the same 1.2M rows at sf0.1). `repartition("src").sortWithinPartitions
("src").persist()` makes the cache advertise the ordering too: one sort
paid at cache build, zero per iteration (EnsureRequirements sees the
required ordering satisfied).

Variants inline + interleaved, one session; top-50 result asserted
identical; wall + JVM CPU per run. Also prints the executed-plan Sort
count for both variants (the claimed plan diff).

Usage: python tools/exp_pagerank_sorted_cache.py [n_rounds]
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from exp_bpe_base_ckpt import jvm_cpu_seconds  # noqa: E402

_SCALE = 1_000_000_000_000.0
_TELEPORT = 150_000_000_000.0
_DAMP = 0.85


def _pagerank(spark, sf_dir: str, sorted_cache: bool):
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.registry import load

    pairs = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionAll(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src").repartition("src")
    if sorted_cache:
        ew = ew.sortWithinPartitions("src")
    ew = ew.persist()
    nodes = ew.select(F.col("src").alias("id")).distinct()
    n_val = nodes.count()
    base = math.floor(_SCALE / n_val)
    teleport = math.floor(_TELEPORT / n_val)

    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            ew.join(ranks, F.col("src") == F.col("id"))
            .groupBy("dst")
            .agg(
                F.sum(
                    F.floor(F.col("r").cast("double") / F.col("outdeg"))
                ).alias("m")
            )
        )
        ranks = contrib.select(
            F.col("dst").alias("id"),
            (F.lit(teleport) + F.floor(F.lit(_DAMP) * F.col("m")))
            .cast("bigint")
            .alias("r"),
        )
    return (
        ranks.select("id", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "id")
        .limit(50)
    )


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="exp-pagerank-sorted", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    ref = [tuple(r) for r in _pagerank(spark, sf, False).collect()]
    spark.catalog.clearCache()
    assert [tuple(r) for r in _pagerank(spark, sf, True).collect()] == ref
    spark.catalog.clearCache()

    wall = {"plain": [], "sorted": []}
    cpu = {"plain": [], "sorted": []}
    sorts = {}
    for i in range(n_rounds):
        for variant in ("plain", "sorted"):
            spark.catalog.clearCache()
            t0, c0 = time.perf_counter(), jvm_cpu_seconds()
            df = _pagerank(spark, sf, variant == "sorted")
            df.write.format("noop").mode("overwrite").save()
            wall[variant].append(round(time.perf_counter() - t0, 3))
            cpu[variant].append(round(jvm_cpu_seconds() - c0, 3))
            if i == 0:
                plan = df._jdf.queryExecution().executedPlan().toString()
                sorts[variant] = {
                    "Sort": len(re.findall(r"\bSort \[", plan)),
                    "SMJ": plan.count("SortMergeJoin"),
                    "BHJ": plan.count("BroadcastHashJoin"),
                }
    print(
        json.dumps(
            {
                "wall_min": {k: min(v) for k, v in wall.items()},
                "cpu_min": {k: min(v) for k, v in cpu.items()},
                "plan": sorts,
                "wall": wall,
                "cpu": cpu,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
