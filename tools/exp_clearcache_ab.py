"""A/B: does spark.catalog.clearCache() between runs change the measured
time of NON-persisting queries (q21, text_quality, gapfill,
session_window)? Distinguishes 'clearCache adds overhead/churn' from
'r7 numbers were cache-assisted or host-favored'."""

from __future__ import annotations

import time

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

spark = get_spark(app_name="ccab", master="local[32]", shuffle_partitions=32)
SF = "/root/testdata/sf0.1"
qs = load_all_operators()

NAMES = [
    "q21_waiting_supplier",
    "text_quality",
    "events_resample_gapfill",
    "stream_session_window",
    "curation_pack_sequences",
]

def run(name):
    qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()

# warm each
for n in NAMES:
    run(n)
    run(n)

for n in NAMES:
    a, b = [], []
    for _ in range(4):
        spark.catalog.clearCache()
        t0 = time.perf_counter(); run(n); a.append(time.perf_counter() - t0)
    for _ in range(4):
        t0 = time.perf_counter(); run(n); b.append(time.perf_counter() - t0)
    print({ "q": n,
            "with_clear": round(min(a), 3),
            "without": round(min(b), 3)}, flush=True)
