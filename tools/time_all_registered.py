"""Time EVERY registered query at the bench SF with the noop-sink
protocol (single steady run after one cold run, clearCache between) —
the round-15 whole-registry cost census. The per-round bench times the
45 headliners; this finds non-headliner outliers worth a deeper look.

Usage: python tools/time_all_registered.py [skip_name ...]
Prints one JSON line {"queries": {name: [cold, steady]}, "errors": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    skip = set(sys.argv[1:])
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="time-all", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = load_all_operators()
    # Warm up the session with the first non-skipped query (don't
    # hardcode a name: it must honor the skip set and survive renames).
    warm = next((n for n in sorted(qs) if n not in skip), None)
    if warm is not None:
        qs[warm].fn(spark, sf).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in sorted(qs):
        if name in skip:
            continue
        q = qs[name]
        try:
            times = []
            for _ in range(2):  # cold + one steady
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                q.fn(spark, sf).write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            out[name] = times
            print(f"{times[1]:8.3f}  {name}", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001 - census must finish
            errors[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"   ERROR  {name}: {errors[name]}", file=sys.stderr)
    print(json.dumps({"queries": out, "errors": errors}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
