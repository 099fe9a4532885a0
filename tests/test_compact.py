"""Small-file compaction: planning, rewrite, atomic publish, data fidelity."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.compact import (
    compact,
    plan_target_files,
)

from .conftest import SF_DIR


def test_plan_target_files():
    assert plan_target_files(0, 128) == 1
    assert plan_target_files(1, 128) == 1
    assert plan_target_files(129, 128) == 2
    assert plan_target_files(1280, 128) == 10


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    frag = str(tmp_path / "fragmented")
    src.repartition(64).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 64
    before = sorted(map(tuple, src.collect()))

    total = sum(
        __import__("os").path.getsize(p)
        for p in glob.glob(f"{frag}/part-*.parquet")
    )
    stats = compact(spark, frag, target_bytes=total // 4 + 1)
    assert stats.files_before == 64
    assert stats.files_after <= 5
    files = glob.glob(f"{frag}/part-*.parquet")
    assert len(files) == stats.files_after
    after = sorted(map(tuple, spark.read.parquet(frag).collect()))
    assert after == before


def test_compact_noop_when_already_compact(spark, tmp_path):
    d = str(tmp_path / "ok")
    spark.range(100).coalesce(1).write.parquet(d)
    n_before = len(glob.glob(f"{d}/part-*.parquet"))
    assert n_before == 1
    stats = compact(spark, d, target_bytes=1 << 30)
    assert stats.files_before == stats.files_after == n_before


def test_compact_with_local_sort(spark, tmp_path):
    d = str(tmp_path / "sorted")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").repartition(32).write.parquet(d)
    compact(spark, d, target_bytes=1 << 40 // 1, sort_by=["o_orderdate"])
    # one output file, internally sorted
    files = glob.glob(f"{d}/part-*.parquet")
    if len(files) == 1:
        vals = [r.o_orderdate for r in spark.read.parquet(files[0]).select("o_orderdate").collect()]
        assert vals == sorted(vals)


def test_compact_publish_failure_restores_original(spark, tmp_path, monkeypatch):
    """If the rename of the rewrite into place fails, the previous dataset
    must be restored at its original path (the aside-rename publish
    protocol) — not deleted, not left in a temp dir nobody reads."""
    import pytest

    from wod_ascii_to_parquet_spark_spark.sources.filesystem import FsClient

    import os

    d = str(tmp_path / "data")
    spark.range(1000).repartition(16).write.parquet(d)
    before = sorted(r.id for r in spark.read.parquet(d).collect())
    total = sum(
        os.path.getsize(p) for p in glob.glob(f"{d}/part-*.parquet")
    )

    real_rename = FsClient.rename

    def failing_rename(self, src, dst):
        if src.endswith("__compact_tmp"):
            return False  # simulate a failed publish of the rewrite
        return real_rename(self, src, dst)

    monkeypatch.setattr(FsClient, "rename", failing_rename)
    with pytest.raises(RuntimeError, match="restored"):
        compact(spark, d, target_bytes=total)  # compact 16 files toward 1
    monkeypatch.undo()
    assert sorted(r.id for r in spark.read.parquet(d).collect()) == before
