"""A/B: guide §3.1/§9 join-strategy confs on the two headliners whose
plans contain SortMergeJoin (`graph_pagerank`, `join_asof_bucketed`):

  A (current): Spark defaults — preferSortMergeJoin=true, AQE
     SMJ->SHJ rewrite off (maxShuffledHashJoinLocalMapThreshold=0)
  B: preferSortMergeJoin=false +
     adaptive.maxShuffledHashJoinLocalMapThreshold=64m

Both are runtime-settable SQL confs, so the variants interleave in ONE
session. Results identical by construction (join strategy only); wall +
JVM CPU recorded per run.

Usage: python tools/exp_shj_conf_ab.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from exp_bpe_base_ckpt import jvm_cpu_seconds  # noqa: E402

QUERIES = ("graph_pagerank", "join_asof_bucketed")

CONFS = {
    "smj": {
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
    },
    "shj": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(
            64 * 1024 * 1024
        ),
    },
}


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="exp-shj-conf", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    qs = load_all_operators()

    # result-identity spot check at sf0.01 (strategy must not change rows)
    for name in QUERIES:
        rows = {}
        for variant, confs in CONFS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            spark.catalog.clearCache()
            rows[variant] = [
                tuple(r) for r in qs[name].fn(spark, "/root/testdata/sf0.01").collect()
            ]
        assert sorted(map(str, rows["smj"])) == sorted(map(str, rows["shj"])), name

    # warm both variants
    for variant, confs in CONFS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        for name in QUERIES:
            spark.catalog.clearCache()
            qs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()

    wall: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in CONFS} for n in QUERIES
    }
    cpu: dict[str, dict[str, list[float]]] = {
        n: {v: [] for v in CONFS} for n in QUERIES
    }
    for _ in range(n_rounds):
        for variant, confs in CONFS.items():
            for k, v in confs.items():
                spark.conf.set(k, v)
            for name in QUERIES:
                spark.catalog.clearCache()
                t0, c0 = time.perf_counter(), jvm_cpu_seconds()
                qs[name].fn(spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall[name][variant].append(round(time.perf_counter() - t0, 3))
                cpu[name][variant].append(round(jvm_cpu_seconds() - c0, 3))
    print(
        json.dumps(
            {
                "wall_min": {
                    n: {v: min(r) for v, r in d.items()}
                    for n, d in wall.items()
                },
                "cpu_min": {
                    n: {v: min(r) for v, r in d.items()}
                    for n, d in cpu.items()
                },
                "wall": wall,
                "cpu": cpu,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
