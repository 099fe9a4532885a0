"""Decompose the ~0.55 s fixed latency of tiny managed-table writes
(OPTIMIZATION_r15 "Not yet optimized" #1 — the next-probe item).

The tokenizer/index artifact stores pay ~0.55 s per ``saveAsTable`` of a
<=9-row frame; round-15 ruled out task count (repartition(1) neutral) and
catalog-name overhead was unmeasured. This experiment separates, in ONE
session, interleaved (variant order rotated per round):

  a. ``df.write.parquet(path)``            — bare path write, no catalog
  b. ``df.write.saveAsTable`` (overwrite)  — catalog + write + commit
  c. ``DROP TABLE`` then fresh ``saveAsTable`` (the _clear_table shape)
  d. variant (a) with 1-slice createDataFrame (isolate empty-task cost)

plus mid-write driver jstack samples (``--jstack``) so the dominant
frames are recorded, not guessed.

Usage: python tools/exp_tiny_write_latency.py [rounds]
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="tiny-write", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    rows = [(i, "a" * 8, "b" * 8, "ab" * 4, 100 + i, "deadbeef" * 4)
            for i in range(9)]
    schema = ("rank int, pair_a string, pair_b string, merged string, "
              "cnt bigint, build_id string")
    tmp = tempfile.mkdtemp(prefix="tiny_write_")
    results: dict[str, list[float]] = {}

    def timed(key: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        results.setdefault(key, []).append(time.perf_counter() - t0)

    def a_path() -> None:
        df = spark.createDataFrame(rows, schema)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "a"))

    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        _clear_table,
    )

    for t in ("tiny_write_b", "tiny_write_c"):
        _clear_table(spark, t)

    def b_table() -> None:
        df = spark.createDataFrame(rows, schema)
        df.write.format("parquet").mode("overwrite").saveAsTable(
            "tiny_write_b")

    def c_drop_table() -> None:
        spark.sql("DROP TABLE IF EXISTS tiny_write_c")
        df = spark.createDataFrame(rows, schema)
        df.write.format("parquet").mode("overwrite").saveAsTable(
            "tiny_write_c")

    def d_one_slice() -> None:
        df = spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1),
            schema,
        )
        df.write.mode("overwrite").parquet(os.path.join(tmp, "d"))

    variants = [("a_path", a_path), ("b_table", b_table),
                ("c_drop_table", c_drop_table), ("d_one_slice", d_one_slice)]
    # warmup: one untimed pass of each
    for _, fn in variants:
        fn()

    jstack = "--jstack" in sys.argv
    if jstack:
        proc = getattr(spark.sparkContext._gateway, "java_process", None)
        pid = proc.pid if proc is not None else None
        # fall back: find the JVM child of this process
        if pid is None:
            out = subprocess.run(
                ["pgrep", "-P", str(os.getpid()), "java"],
                capture_output=True, text=True).stdout.split()
            pid = int(out[0]) if out else None

        def dump_loop(stop: threading.Event) -> None:
            i = 0
            while not stop.is_set():
                time.sleep(0.15)
                if pid:
                    d = subprocess.run(["jstack", str(pid)],
                                       capture_output=True, text=True).stdout
                    with open(f"/tmp/tiny_write_jstack_{i}.txt", "w") as fh:
                        fh.write(d)
                    i += 1

        stop = threading.Event()
        t = threading.Thread(target=dump_loop, args=(stop,), daemon=True)
        t.start()
        for _ in range(3):
            b_table()
        stop.set()
        t.join(timeout=2)
        print(f"jstack dumps in /tmp/tiny_write_jstack_*.txt (pid={pid})")

    for r in range(rounds):
        order = variants[r % len(variants):] + variants[: r % len(variants)]
        for key, fn in order:
            timed(key, fn)
    shutil.rmtree(tmp, ignore_errors=True)
    for key, ts in sorted(results.items()):
        print(f"{key}: min {min(ts):.3f}  med {sorted(ts)[len(ts)//2]:.3f} "
              f" all {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
