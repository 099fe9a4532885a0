"""Per-headliner split of query cost: fn() DataFrame-construction time
(driver-side Python + py4j + analysis) vs execution time (noop sink).

Guide §5/§7.3: the driver should do almost no data work — a large fn()
constant means py4j chatter / plan construction, attackable by moving
unrolled Column algebra into single-parse SQL text. Run on a quiet host;
min-of-N per query, clearCache between runs.

Usage: python tools/profile_fn_vs_exec.py [rounds] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wod_ascii_to_parquet_spark_spark.registry import (
    cached_frames,
    load_all_operators,
)
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = set(sys.argv[2:])
    import bench

    names = list(bench.HEADLINERS)
    if only:
        names = [n for n in names if n in only] + sorted(
            only - set(names)
        )
    spark = get_spark(
        app_name="profile-fn-vs-exec", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    qs = load_all_operators()
    # warmup
    with cached_frames():
        qs[names[0]].fn(spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()

    out = {}
    for name in names:
        fn_times, ex_times = [], []
        for _ in range(rounds):
            spark.catalog.clearCache()
            with cached_frames():
                t0 = time.perf_counter()
                df = qs[name].fn(spark, SF)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
            fn_times.append(t1 - t0)
            ex_times.append(t2 - t1)
        out[name] = {
            "fn_min": round(min(fn_times), 3),
            "exec_min": round(min(ex_times), 3),
        }
        print(
            f"{name:42s} fn {min(fn_times):7.3f}  exec {min(ex_times):7.3f}",
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
