"""Time individual registry queries with the bench protocol (noop sink,
1 cold + min-of-N steady, clearCache between runs) — the per-optimization
A/B harness for round 15.

Usage: python tools/time_queries.py [-n STEADY_RUNS] <query> [query ...]

Prints one JSON line: {"queries": {name: min_sec}, "cold": {...},
"runs": {name: [sec, ...]}, "probe": s, "par_probe": s} so A/B pairs can
be compared under the host-weather probes bench.py uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    n_steady = 3
    if args and args[0] == "-n":
        n_steady = int(args[1])
        args = args[2:]
    if not args:
        print("usage: time_queries.py [-n N] <query> [query ...]")
        return 2

    from bench import _cpu_probe, _cpu_probe_parallel

    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="time-queries", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    qs = load_all_operators()
    # same JVM warmup as bench.py
    qs["flagship_regional_revenue"].fn(spark, sf).write.format("noop").mode(
        "overwrite"
    ).save()

    probe_before, par_before = _cpu_probe(), _cpu_probe_parallel()
    cold: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    for name in args:
        q = qs[name]
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        q.fn(spark, sf).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        steady = []
        for _ in range(n_steady):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            q.fn(spark, sf).write.format("noop").mode("overwrite").save()
            steady.append(round(time.perf_counter() - t0, 3))
        runs[name] = steady
        timings[name] = min(steady)
    probe_after, par_after = _cpu_probe(), _cpu_probe_parallel()
    print(
        json.dumps(
            {
                "queries": timings,
                "cold": cold,
                "runs": runs,
                "probe": max(probe_before, probe_after),
                "par_probe": max(par_before, par_after),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
