"""Source/sink format matrix: parquet/orc/json/csv roundtrips, compression
codecs, partition pruning, and the lakehouse gate."""

from __future__ import annotations

import glob
import os

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
    LakehouseUnavailable,
    read_delta,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _assert_same(a, b, key="o_orderkey"):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, orders, tmp_path, fmt):
    out = str(tmp_path / fmt)
    df = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(out)
    reader = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        reader = reader.schema("o_orderkey bigint, o_orderstatus string, o_totalprice double")
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(out)
    _assert_same(df, back)


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip"])
def test_parquet_compression_codecs(spark, orders, tmp_path, codec):
    out = str(tmp_path / codec)
    orders.write.mode("overwrite").option("compression", codec).parquet(out)
    assert spark.read.parquet(out).count() == orders.count()
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert files and all(f".{ 'gz' if codec=='gzip' else codec}." in os.path.basename(f) for f in files)


def test_partition_pruning(spark, orders, tmp_path):
    out = str(tmp_path / "by_status")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    df = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the filter must become a partition filter on the scan, not a row filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan.replace("#", "").replace(
        ")", ""
    ) or "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "o_orderstatus" in pf_line
    expected = orders.filter(F.col("o_orderstatus") == "O").count()
    assert df.count() == expected


def test_lakehouse_gate_raises_cleanly(spark, tmp_path):
    with pytest.raises(LakehouseUnavailable, match="Delta Lake"):
        read_delta(spark, str(tmp_path))


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Schema evolution across parquet batches — the 100 TB lake reality:
    later writers add columns. ``mergeSchema`` must unify the footers
    (old rows read the new column as NULL); the narrow single-footer
    default is what makes the option necessary."""
    out = str(tmp_path / "evolving")
    spark.range(3).select(
        F.col("id"), (F.col("id") * 10).alias("a")
    ).write.parquet(out)
    spark.range(3, 6).select(
        F.col("id"), (F.col("id") * 10).alias("a"), F.lit("new").alias("b")
    ).write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[0] == (0, None)  # old batch: evolved column reads NULL
    assert rows[5] == (50, "new")
    assert merged.filter(F.col("b").isNull()).count() == 3

    # the evolved column also survives a filtered scan with pushdown
    got = merged.filter(F.col("b") == "new").select("id").collect()
    assert sorted(r.id for r in got) == [3, 4, 5]
