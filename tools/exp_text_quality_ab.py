"""Adjudicate the r10 `text_quality` above-band bench reading (VERDICT
r10 #1): driver read 0.418 s vs projected band [0.245, 0.315], with the
query's code unchanged since r6 (verified: `git log -S`/diff over
operators/text.py r6..r10 shows no change to text_quality) and the r10
host FASTER by single-thread probe (ratio 0.874 vs r9).

Protocol (the exp_curation_barrier idle-A/B discipline):

A) ISOLATED: fresh tuned session (same get_spark/conf as bench.py),
   flagship warmup, 1 cold + min-of-8 steady runs with
   clearCache between runs, noop sink — the bench measurement with 8x
   the steady samples and nothing else running.
B) BENCH-CONTEXT: the same session then executes every HEADLINER that
   precedes text_quality in bench order once (untimed), and re-times
   text_quality min-of-8 — detects session-history effects (GC/JIT/
   broadcast-cleanup pressure) an isolated run cannot see.

Both arms print all raw runs; single-thread + 16-way parallel CPU
probes anchor the host. text_quality is a map-only projection over
documents (no shuffle, no persist), so plan-level regression is ruled
out by construction if A ~= band.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # repo-root bench.py: reuse the exact probe workloads

from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
from wod_ascii_to_parquet_spark_spark.session import get_spark

CPUS = 32
SF_DIR = "/root/testdata/sf0.1"

spark = get_spark(
    app_name="tq_ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
)
queries = load_all_operators()

probe = bench._cpu_probe()
probe_par = bench._cpu_probe_parallel()

def _noop(name: str) -> None:
    queries[name].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()


def time_tq(n: int = 8) -> list[float]:
    runs = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop("text_quality")
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


# --- A: isolated ---
_noop("flagship_regional_revenue")  # bench's untimed JVM warmup
spark.catalog.clearCache()
t0 = time.perf_counter()
_noop("text_quality")
cold = round(time.perf_counter() - t0, 3)
runs_a = time_tq()

# --- B: bench-context (every headliner before text_quality, once) ---
prefix = bench.HEADLINERS[: bench.HEADLINERS.index("text_quality")]
for name in prefix:
    spark.catalog.clearCache()
    _noop(name)
runs_b = time_tq()

print(
    json.dumps(
        {
            "cpu_probe_sec": probe,
            "cpu_probe_par_sec": probe_par,
            "cold": cold,
            "isolated_runs": runs_a,
            "isolated_min": min(runs_a),
            "bench_context_runs": runs_b,
            "bench_context_min": min(runs_b),
            "r10_driver_reading": 0.418,
            "band_projected_r10": [0.245, 0.315],
        }
    ),
    flush=True,
)
