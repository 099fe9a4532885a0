"""Scale-up evidence for the CORE workload (WOD convert): measure
convert_file at 1x / 4x / 16x the bundled fixture and a multi-file
``convert`` run, then append a ``convert`` section to SCALING.json.

Input synthesis: the WOD ASCII format is a self-delimiting stream of
cast records (each record carries its own byte length in the header),
so concatenating the decompressed fixture N times is a valid N-times
larger input — same cast distribution, same 1,652 geohash3 partition
dirs, N-times the rows per output file. That makes the sweep isolate
the two costs that grow with data: the single-file gunzip+frame scatter
and the per-partition-file row volume, while the fixed per-file costs
(1,652 parquet creations, footer attach) stay constant — exactly the
amortization story a real multi-terabyte year file benefits from.

Writes temp inputs under /tmp (never touches /root/testdata or the
read-only reference tree).
"""

from __future__ import annotations

import gzip
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convscale", master="local[32]", shuffle_partitions=32)

from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask, convert, convert_file

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"
# x128 added r14 (VERDICT r13 #5): the third decade — 1.2M casts,
# ~716 MB raw through ONE unsplittable gzip read task, the worst-case
# single-file shape the REBALANCE writer must keep sub-linear.
FACTORS = [1, 4, 16, 64, 128]


def _layout_stats(out_root: str) -> dict:
    """Output-layout behavior at this factor (VERDICT r10 #4): data-file
    count, geohash3 partition-dir count, bytes — the writer-side numbers
    that decide whether the files x size frontier holds at 100x."""
    n_files = n_dirs = n_bytes = 0
    for dirpath, dirnames, filenames in os.walk(out_root):
        n_dirs += sum(1 for d in dirnames if d.startswith("geohash3="))
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(dirpath, f))
    return {
        "data_files": n_files,
        "geohash3_dirs": n_dirs,
        "output_mb": round(n_bytes / 1e6, 1),
    }

workdir = tempfile.mkdtemp(prefix="convscale_")
raw = gzip.decompress(open(SRC, "rb").read())
inputs: dict[int, str] = {}
for n in FACTORS:
    p = os.path.join(workdir, f"XBTO1967x{n}.gz")
    with gzip.open(p, "wb", compresslevel=1) as fh:
        for _ in range(n):
            fh.write(raw)
    inputs[n] = p

# JIT warmup: the write path needs ~4 runs to reach steady state
# (tools/exp_convert_stages.py) — warm on the 1x input first.
for _ in range(4):
    out = tempfile.mkdtemp(prefix="convscale_w_")
    try:
        convert_file(spark, FileTask("XBT", "OBS", inputs[1], out, out))
    finally:
        shutil.rmtree(out, ignore_errors=True)

results: dict[str, dict] = {}
for n in FACTORS:
    runs = []
    layout = None
    for i in range(3):
        out = tempfile.mkdtemp(prefix=f"convscale_{n}_")
        try:
            t0 = time.perf_counter()
            convert_file(spark, FileTask("XBT", "OBS", inputs[n], out, out))
            runs.append(time.perf_counter() - t0)
            if i == 0:
                layout = _layout_stats(out)
        finally:
            shutil.rmtree(out, ignore_errors=True)
    results[f"x{n}"] = dict(
        {"sec": round(min(runs), 3), "casts": 9390 * n},
        **(layout or {}),
        writer_tasks=min(16, spark.sparkContext.defaultParallelism),
    )
    print({"factor": n, "runs": [round(r, 2) for r in runs], **(layout or {})}, flush=True)

t1, t16 = results["x1"]["sec"], results["x16"]["sec"]
exponent = round(math.log(t16 / t1) / math.log(16), 3)
t64 = results["x64"]["sec"]
exponent_64 = round(math.log(t64 / t1) / math.log(64), 3)
t128 = results["x128"]["sec"]
exponent_128 = round(math.log(t128 / t1) / math.log(128), 3)
# the marginal decade exponent is the forward-looking one: fixed
# per-file costs are fully amortized by x16, so x16→x128 isolates the
# variable (per-cast) slope the next 10× would follow
exponent_x16_to_x128 = round(math.log(t128 / t16) / math.log(8), 3)

# Multi-file: 8 distinct 1x files through the `convert` plan, pooled vs
# serial — evidence the thread pool pipelines scheduling gaps.
multi_root = os.path.join(workdir, "multi")
for i in range(8):
    d = os.path.join(multi_root, "XBT", "OBS")
    os.makedirs(d, exist_ok=True)
    shutil.copy(inputs[1], os.path.join(d, f"XBTO{1960 + i}.gz"))

multi: dict[str, float] = {}
for conc in (1, 4):
    out_root = tempfile.mkdtemp(prefix=f"convscale_m{conc}_")
    try:
        t0 = time.perf_counter()
        convert(
            spark,
            multi_root,
            out_root,
            datasets=("XBT",),
            levels=("OBS",),
            max_concurrent=conc,
        )
        multi[f"concurrent_{conc}"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)
print({"multi_file_8x1": multi}, flush=True)

# files x size frontier point: 8 files x 16x each through the pool —
# grows BOTH axes (vs 8x1: 16x the bytes; vs single x16: 8x the files).
multi16_root = os.path.join(workdir, "multi16", "XBT", "OBS")
os.makedirs(multi16_root, exist_ok=True)
for i in range(8):
    shutil.copy(inputs[16], os.path.join(multi16_root, f"XBTO{1960 + i}.gz"))
out_root = tempfile.mkdtemp(prefix="convscale_m16_")
try:
    t0 = time.perf_counter()
    convert(
        spark,
        os.path.join(workdir, "multi16"),
        out_root,
        datasets=("XBT",),
        levels=("OBS",),
        max_concurrent=4,
    )
    multi_8x16 = round(time.perf_counter() - t0, 3)
finally:
    shutil.rmtree(out_root, ignore_errors=True)
print({"multi_file_8x16_concurrent_4": multi_8x16}, flush=True)

doc = json.load(open("/root/repo/SCALING.json"))
doc["convert"] = {
    "input": "XBTO1967 fixture repeated Nx (9,390 casts, 5.6 MB raw each)",
    "method": "min of 3 warm runs per factor after 4-run JIT warmup; "
    "fresh output dir per run; single convert_file job; layout stats "
    "(data files / geohash3 dirs / bytes) from each factor's first run",
    "factors": results,
    "exponent_x1_to_x16": exponent,
    "exponent_x1_to_x64": exponent_64,
    "exponent_x1_to_x128": exponent_128,
    "exponent_x16_to_x128": exponent_x16_to_x128,
    "multi_file_8x1_sec": multi,
    "multi_file_8x16_concurrent_4_sec": multi_8x16,
    "note": (
        "Sublinear exponent expected: the parquet file creations + "
        "footer attach are fixed per file-job (the geohash3 dir count "
        "saturates at the fixture's key population), so per-cast cost "
        "falls as the input grows — the amortization real multi-GB year "
        "files get. Files x size frontier: gzip is unsplittable, so the "
        "per-file READ is one task, but wod_scan(scatter=True) "
        "re-exchanges framed records to cluster width, so DECODE is "
        "never bounded by file size — only the single gunzip+frame pass "
        "is, growing linearly with bytes. Writer side is bounded at "
        "min(16, parallelism) tasks per file-job regardless of factor "
        "(recorded per factor); file count per job is the layout "
        "contract (one per geohash3 dir per writer task that holds it). "
        "The multi-file pairs evidence the convert pool (LPT + "
        "ThreadPoolExecutor) pipelining independent file jobs on both "
        "axes. Honesty checks (r11): the replicated input parses to "
        "true Nx casts (x4 measured 37,560 via wod_scan, not assumed); "
        "output BYTES stay nearly flat because the replicated rows "
        "sort adjacent and dictionary/RLE-collapse - a synthesis "
        "artifact, so bytes are not representative, while rows/time "
        "are (encode CPU scales with rows). x64 = 357 MB through ONE "
        "gzip stream: the single gunzip+frame task is the linear term "
        "that bends the curve from alpha 0.21 (x16) to 0.37 (x64) - "
        "the gzip-unsplittable frontier made measurable; the scatter "
        "exchange keeps field-decode at cluster width regardless."
    ),
}
json.dump(doc, open("/root/repo/SCALING.json", "w"), indent=1)
shutil.rmtree(workdir, ignore_errors=True)
print("SCALING.json updated", flush=True)
