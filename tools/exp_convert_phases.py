"""Phase-level timing of convert_file on a warm session: plan build vs
main write job vs footer attach vs sidecar, to find where the residual
driver-bench cost sits (directive r7->r8 #5)."""

from __future__ import annotations

import shutil
import tempfile
import time

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convphase", master="local[32]", shuffle_partitions=32)

import wod_ascii_to_parquet_spark_spark.plans.convert as C
import wod_ascii_to_parquet_spark_spark.plans.geo_metadata as G
from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"

orig_attach = G.attach_geo_footer
orig_scan = C.wod_scan
phases = {}


def timed_attach(*a, **k):
    t0 = time.perf_counter()
    r = orig_attach(*a, **k)
    phases["attach_footer"] = phases.get("attach_footer", 0) + time.perf_counter() - t0
    return r


def timed_scan(*a, **k):
    t0 = time.perf_counter()
    r = orig_scan(*a, **k)
    phases["scan_plan_build"] = phases.get("scan_plan_build", 0) + time.perf_counter() - t0
    return r


C.attach_geo_footer = timed_attach
C.wod_scan = timed_scan

# Patch the write by timing around the whole convert and subtracting known
# phases; additionally time the casts plan build by wrapping geohash_col.
import wod_ascii_to_parquet_spark_spark.functions.geohash as GH

orig_geo = C.geohash_col


def timed_geo(*a, **k):
    t0 = time.perf_counter()
    r = orig_geo(*a, **k)
    phases["geohash_build"] = phases.get("geohash_build", 0) + time.perf_counter() - t0
    return r


C.geohash_col = timed_geo

for i in range(3):
    phases.clear()
    out = tempfile.mkdtemp(prefix="convphase_")
    try:
        task = FileTask("XBT", "OBS", SRC, out, out)
        t0 = time.perf_counter()
        C.convert_file(spark, task)
        total = time.perf_counter() - t0
        print(
            {"run": i, "total": round(total, 3)}
            | {k: round(v, 3) for k, v in phases.items()},
            flush=True,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
