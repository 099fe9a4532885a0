"""Dump ``explain("formatted")`` for headline queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [name ...]

Writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt`` (default r16) for each requested query (default:
every bench headliner). Building a query's DataFrame runs any driver-side
plan-construction jobs the operator owns (BPE training argmax rows, index
builds) but never executes the returned frame itself.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINERS

    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    names = sys.argv[2:] or list(HEADLINERS)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="dump-plans", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = load_all_operators()
    outdir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        df = qs[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
