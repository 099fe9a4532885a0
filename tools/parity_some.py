"""Oracle-parity check for SPECIFIC queries (round-15 per-optimization
gate): same compare as tools/parity_sf001.py but only for the names given
— run after every optimization that touches a query's plan to prove the
result is unchanged before moving on.

Usage: python tools/parity_some.py <query> [query ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if not args:
        print("usage: parity_some.py <query> [query ...] [--sf DIR]")
        return 2

    from oracle_harness import compare, duck_connection

    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="parity-some", master="local[16]", shuffle_partitions=16
    )
    con = duck_connection(sf)
    qs = load_all_operators()
    bad = 0
    for name in args:
        q = qs[name]
        if not q.oracle:
            print(f"SKIP {name}: no oracle (rows-only query)")
            continue
        try:
            problems = compare(q.fn(spark, sf), con, q.oracle)
        except Exception as e:  # noqa: BLE001 — a crash IS a failure row
            problems = [f"EXC {type(e).__name__}: {e}"]
        if problems:
            bad += 1
            print(f"FAIL {name}: {problems[:2]}", flush=True)
        else:
            print(f"OK   {name}", flush=True)
    print(f"DONE checked={len(args)} failures={bad}", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
