"""Re-measure the pooled 8×16x convert row under the protected protocol
(VERDICT r14 #6): the r14 ledger's 89.6 s was a ONE-run number taken
while ambient host load returned; the multi-file-pool scale story (the
100 TB path) needs a min-of-3 row. Synthesizes the same inputs as
``bench_convert_scaling.py`` (8 copies of the 16x-replicated fixture),
runs one JIT warmup then 3 measured pooled converts (max_concurrent=4),
and replaces ``SCALING.json convert.multi_file_8x16_concurrent_4_sec``
with ``{"runs": [...], "sec": min}``.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wod_ascii_to_parquet_spark_spark.session import get_spark

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"


def main() -> int:
    spark = get_spark(
        app_name="pooled-remeasure", master="local[32]", shuffle_partitions=32
    )
    from wod_ascii_to_parquet_spark_spark.plans.convert import convert

    workdir = tempfile.mkdtemp(prefix="pooled16_")
    try:
        with gzip.open(SRC, "rb") as f:
            raw = f.read()
        x16 = os.path.join(workdir, "x16.gz")
        with gzip.open(x16, "wb", compresslevel=1) as f:
            for _ in range(16):
                f.write(raw)
        in_root = os.path.join(workdir, "multi16", "XBT", "OBS")
        os.makedirs(in_root)
        for i in range(8):
            shutil.copy(x16, os.path.join(in_root, f"XBTO{1960 + i}.gz"))

        runs: list[float] = []
        for i in range(4):  # run 0 = JIT warmup, discarded
            out_root = tempfile.mkdtemp(prefix=f"pooled16_out{i}_")
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
                dt = round(time.perf_counter() - t0, 3)
            finally:
                shutil.rmtree(out_root, ignore_errors=True)
            print({"run": i, "sec": dt, "warmup": i == 0}, flush=True)
            if i > 0:
                runs.append(dt)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.json",
    )
    doc = json.load(open(path))
    doc["convert"]["multi_file_8x16_concurrent_4_sec"] = {
        "runs": runs,
        "sec": min(runs),
        "method": "min of 3 warm pooled runs after 1 warmup, idle host "
        "(r15 re-measure of the unprotected r14 one-run 89.6 s row)",
    }
    json.dump(doc, open(path, "w"), indent=1)
    print({"multi_file_8x16_concurrent_4_sec": min(runs), "runs": runs})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
