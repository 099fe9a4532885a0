"""Z-order clustering: key correctness and the data-skipping property the
layout exists for (per-file min/max tightness on BOTH dimensions)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.zorder import (
    zorder_key,
    zorder_write,
)

from .conftest import SF_DIR


def _interleave_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)],
        "x int, y int",
    ).withColumn("z", zorder_key(F.col("x"), F.col("y")))
    for r in df.collect():
        assert r.z == _interleave_py(r.x, r.y), (r.x, r.y)


def test_zorder_write_gives_two_dimensional_locality(spark, tmp_path):
    """After zorder_write, each parquet file's (x, y) min/max boxes must be
    dramatically tighter than the global range — that tightness IS the
    data-skipping win. A single-column sort on x gives tight x ranges but
    full-width y ranges; z-order bounds both."""
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path / "zordered")
    zorder_write(df, out, "x", "y", n_files=16)

    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) >= 8
    # Average per-file extent in each dimension: for 16 z-range files over
    # a 64x64 grid, each file covers ~1/16 of the z-space = a compact block
    # (≤ ~1/2 of each axis), not a full-width stripe.
    tot_x = tot_y = 0.0
    for f in files:
        stats = (
            spark.read.parquet(f)
            .agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y"), F.count(F.lit(1))
            )
            .first()
        )
        tot_x += (stats[1] - stats[0]) / 63.0
        tot_y += (stats[3] - stats[2]) / 63.0
    avg_x, avg_y = tot_x / len(files), tot_y / len(files)
    assert avg_x <= 0.6, f"x extent too wide: {avg_x}"
    assert avg_y <= 0.6, f"y extent too wide: {avg_y}"
    # and the data survived intact
    assert spark.read.parquet(out).count() == n
