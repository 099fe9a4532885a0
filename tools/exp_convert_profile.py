"""Directive r7->r8 #5: profile the wod_convert_xbt driver-vs-warm gap.

Reproduces bench.py's convert segment (min of 2 runs, fresh output dirs)
in a fresh process and phase-times each run, plus a third run with
per-phase timers patched around the convert internals."""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

t_import0 = time.perf_counter()
from wod_ascii_to_parquet_spark_spark.session import get_spark

t_import_session = time.perf_counter() - t_import0

t0 = time.perf_counter()
spark = get_spark(app_name="convprof", master="local[32]", shuffle_partitions=32)
t_spark = time.perf_counter() - t0

t0 = time.perf_counter()
from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask, convert_file

t_import_convert = time.perf_counter() - t0

print(
    {
        "import_session_sec": round(t_import_session, 3),
        "spark_session_sec": round(t_spark, 3),
        "import_convert_sec": round(t_import_convert, 3),
    },
    flush=True,
)

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"
for i in range(4):
    out = tempfile.mkdtemp(prefix="convprof_")
    try:
        task = FileTask("XBT", "OBS", SRC, out, out)
        t0 = time.perf_counter()
        convert_file(spark, task)
        print({"run": i, "sec": round(time.perf_counter() - t0, 3)}, flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
