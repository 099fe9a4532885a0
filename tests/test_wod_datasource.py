"""The Python-DataSource WOD reader must produce exactly the casts the
mapInPandas scan produces — same decoder, two planner surfaces."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from wod_ascii_to_parquet_spark_spark.sources.wod_ascii import wod_scan
from wod_ascii_to_parquet_spark_spark.sources.wod_datasource import (
    register_wod_datasource,
)

FIXTURE = "/root/reference/src/test/resources/wod/CTD/OBS/CTDO1971.gz"


@pytest.fixture(scope="module")
def ds_df(spark):
    register_wod_datasource(spark)
    return spark.read.format("wod_ascii").load(FIXTURE)


def test_datasource_matches_mapinpandas_scan(spark, ds_df):
    via_scan = wod_scan(spark, FIXTURE)
    proj = lambda df: {  # noqa: E731
        tuple(r)
        for r in df.filter(F.col("ok").isNotNull())
        .select(
            "ok.castNumber",
            "ok.year",
            "ok.latitude",
            "ok.longitude",
            F.size("ok.depths"),
            F.size("ok.variables"),
        )
        .collect()
    }
    a, b = proj(ds_df), proj(via_scan)
    assert a == b and len(a) > 0


def test_datasource_error_channel_parity(spark, ds_df):
    via_scan = wod_scan(spark, FIXTURE)
    n_err_ds = ds_df.filter(F.col("err").isNotNull()).count()
    n_err_scan = via_scan.filter(F.col("err").isNotNull()).count()
    assert n_err_ds == n_err_scan


def test_datasource_directory_load_partitions_per_file(spark):
    register_wod_datasource(spark)
    df = spark.read.format("wod_ascii").load(
        "/root/reference/src/test/resources/wod/XBT"
    )
    assert df.count() > 0


def test_datasource_missing_path_fails(spark):
    register_wod_datasource(spark)
    with pytest.raises(Exception):
        spark.read.format("wod_ascii").load("/nonexistent/nowhere").count()
