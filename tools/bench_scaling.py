"""SCALING evidence run (VERDICT r7 #3): run every bench headliner at
sf0.1 (the driver's bench SF) and at the synthesized sf1 (10x rows, see
tools/make_sf.py) and record the per-query scaling exponent

    alpha = log(t_sf1 / t_sf0.1) / log(10)

so "scales by plan shape" claims become measured curves: alpha ~ 1 is
linear, alpha < 1 means fixed overhead still dominates at these sizes,
alpha > 1 is superlinear and needs a root cause. Results land in
SCALING.json at the repo root; bench.py embeds them into
BENCH_DETAIL.json so the per-round artifact carries both SFs.

wod_convert_xbt is excluded: its input is the fixed reference fixture
(9,390 casts), not an SF-scaled table, so it has no scaling axis here.

Usage: python tools/bench_scaling.py [query ...]   (default: all)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_BIG = os.path.join(REPO, "spark-warehouse", "sf1")
RATIO = 10.0  # sf1 / sf0.1 row ratio
RUNS = 3  # 1 warm (codegen) + min of (RUNS-1) measured


def _time_query(spark, fn, sf_dir: str) -> float:
    times = []
    for r in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times[1:]), 3)


def main() -> None:
    from bench import CPUS, HEADLINERS, _cpu_probe_parallel
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="bench-scaling",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    queries = load_all_operators()
    names = [n for n in (sys.argv[1:] or HEADLINERS) if n in queries]

    # JVM warmup (same reasoning as bench.py)
    queries["flagship_regional_revenue"].fn(spark, SF_SMALL).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name].fn
        t_small = _time_query(spark, fn, SF_SMALL)
        t_big = _time_query(spark, fn, SF_BIG)
        alpha = round(
            math.log(max(t_big, 1e-3) / max(t_small, 1e-3))
            / math.log(RATIO),
            3,
        )
        out[name] = {"sf0.1_sec": t_small, "sf1_sec": t_big, "exponent": alpha}
        print(f"{name}: {t_small}s -> {t_big}s  alpha={alpha}", flush=True)

    # Merge into the existing record: partial re-runs (after fixing one
    # query) must not drop the rest of the sweep's evidence.
    path = os.path.join(REPO, "SCALING.json")
    try:
        with open(path) as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        doc = {"queries": {}, "notes": {}}
    doc.update(
        sf_small=SF_SMALL,
        sf_big=SF_BIG,
        row_ratio=RATIO,
        cpus=CPUS,
        cpu_probe_par_sec=_cpu_probe_parallel(),
        method=(
            f"min of {RUNS - 1} measured runs after 1 warm run per "
            "(query, sf); cache cleared between runs"
        ),
    )
    doc.setdefault("queries", {}).update(out)
    doc.setdefault("notes", {})
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)
    superlinear = {
        n: d["exponent"] for n, d in out.items() if d["exponent"] > 1.15
    }
    print(json.dumps({"superlinear": superlinear}))


if __name__ == "__main__":
    main()
