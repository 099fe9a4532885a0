"""Skewed-input convert evidence (VERDICT r11 #2): the two-decade convert
sweep replicated the fixture uniformly, but real WOD geohash3 occupancy
is coastal-skewed, and ``convert_file``'s ``repartition(16, geohash3)``
(plans/convert.py) routes a hot geohash3 ENTIRELY to one writer task.
This measures whether that straggler dominates at a heavy skew before
deciding whether the write needs within-partition salting.

Synthesis: the fixture's 80-char-line physical format lets records be
sliced and recomposed byte-faithfully (each logical record occupies a
whole number of lines; ``split_records`` + line spans). Two x16 inputs
with the SAME cast count (150,240):

- uniform: the fixture stream repeated 16x (the existing sweep's shape;
  hottest geohash3 = dw3 at 4.6% of casts);
- skewed:  the fixture stream repeated 8x + the hottest-geohash3
  records replicated to the other half — one geohash3 then holds >50%
  of all casts, the 1-in-16-writer-tasks worst case.

Protocol matches tools/bench_convert_scaling.py: 4 warm runs on the 1x
fixture, then min of 3 measured convert_file runs per input. The delta
(skewed - uniform) bounds the straggler cost: the decode/frame stages
are identical by construction (same cast count, one gzip stream), so
any excess is the hot writer task (75k-row sort+write vs 9.4k mean).

Decision rule (recorded either way): salt within the hot geohash3 only
if the skewed run exceeds the uniform run by >25% — below that the
single-gzip decode bound dominates and salting would buy nothing at
this shape (a negative result is still the evidence the 100 TB design
needs: per-file skew is bounded by file size, and cross-file compaction
buckets by (geohash3, salt) — see plans/convert.py scale notes).

Output: SCALING.json["convert"]["skew_x16"].
"""

from __future__ import annotations

import collections
import gzip
import json
import math
import os
import shutil
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys

sys.path.insert(0, REPO)

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convskew", master="local[32]", shuffle_partitions=32)

from wod_ascii_to_parquet_spark_spark.functions.geohash import (
    geohash_encode_numpy,
)
from wod_ascii_to_parquet_spark_spark.plans.convert import FileTask, convert_file
from wod_ascii_to_parquet_spark_spark.sources.wod_format import (
    parse_cast,
    split_records,
)

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"
FACTOR = 16
RUNS = 3


def _record_line_spans(text: str) -> list[tuple[int, int]]:
    """(start_line, end_line) of every record in the 80-char-line stream
    — records occupy whole padded lines, so line slices recompose
    byte-faithfully."""
    spans = []
    at = 0
    for rec in split_records(text):
        n = math.ceil(len(rec) / 80)
        spans.append((at, at + n))
        at += n
    return spans


def main() -> None:
    raw = gzip.decompress(open(SRC, "rb").read()).decode("ascii")
    lines = raw.split("\n")
    recs = list(split_records(raw))
    spans = _record_line_spans(raw)

    g3 = []
    for rec in recs:
        c = parse_cast(rec, "XBT")
        g3.append(
            geohash_encode_numpy(
                np.array([c.latitude]), np.array([c.longitude])
            )[0][:3]
            if c.latitude is not None and c.longitude is not None
            else None
        )
    hot, hot_n = collections.Counter(g for g in g3 if g).most_common(1)[0]
    hot_lines = []
    for i, g in enumerate(g3):
        if g == hot:
            lo, hi = spans[i]
            hot_lines.extend(lines[lo:hi])
    n_casts = len(recs)
    total = n_casts * FACTOR
    half = total // 2
    print(f"hottest geohash3={hot}: {hot_n}/{n_casts} casts "
          f"({hot_n / n_casts:.1%}); skew target {half}/{total}", flush=True)

    workdir = tempfile.mkdtemp(prefix="convskew_")
    body = "\n".join(lines).rstrip("\n") + "\n"  # one clean stream copy

    uniform = os.path.join(workdir, "XBTO1967x16_uniform.gz")
    with gzip.open(uniform, "wt", compresslevel=1) as fh:
        for _ in range(FACTOR):
            fh.write(body)

    skewed = os.path.join(workdir, "XBTO1967x16_skewed.gz")
    reps = math.ceil(half / hot_n)
    hot_block = "\n".join(hot_lines) + "\n"
    with gzip.open(skewed, "wt", compresslevel=1) as fh:
        for _ in range(FACTOR // 2):
            fh.write(body)
        for _ in range(reps):
            fh.write(hot_block)
    skew_casts = n_casts * (FACTOR // 2) + reps * hot_n
    hot_share = (hot_n * (FACTOR // 2) + reps * hot_n) / skew_casts
    print(f"skewed input: {skew_casts} casts, hot cell share "
          f"{hot_share:.1%}", flush=True)

    # JIT warmup (same reasoning as the scaling sweep)
    onex = os.path.join(workdir, "XBTO1967x1.gz")
    shutil.copy(SRC, onex)
    for _ in range(4):
        out = tempfile.mkdtemp(prefix="convskew_w_")
        try:
            convert_file(spark, FileTask("XBT", "OBS", onex, out, out))
        finally:
            shutil.rmtree(out, ignore_errors=True)

    results: dict[str, dict] = {}
    for label, path, casts in (
        ("uniform", uniform, total),
        ("skewed", skewed, skew_casts),
    ):
        runs = []
        for _ in range(RUNS):
            out = tempfile.mkdtemp(prefix=f"convskew_{label}_")
            try:
                t0 = time.perf_counter()
                convert_file(spark, FileTask("XBT", "OBS", path, out, out))
                runs.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(out, ignore_errors=True)
        results[label] = {
            "sec": round(min(runs), 3),
            "runs": [round(r, 2) for r in runs],
            "casts": casts,
        }
        print({label: results[label]}, flush=True)

    ratio = round(results["skewed"]["sec"] / results["uniform"]["sec"], 3)
    rec = {
        "hot_geohash3": hot,
        "hot_share": round(hot_share, 3),
        "uniform": results["uniform"],
        "skewed": results["skewed"],
        "skew_over_uniform": ratio,
        "straggler_dominates": ratio > 1.25,
        "note": "same cast count both arms; decode/frame identical by "
        "construction, so the delta bounds the hot writer task "
        "(repartition(16, geohash3) sends the hot cell to one task)",
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc.setdefault("convert", {})["skew_x16"] = rec
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(rec), flush=True)
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
