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


def test_wod_datasource_streaming_incremental(spark, tmp_path):
    """readStream.format("wod_ascii"): each new file becomes exactly one
    incremental batch; counts accumulate and nothing is reprocessed (the
    file-set offsets make batch replay content-stable)."""
    import shutil

    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.sources.wod_datasource import (
        register_wod_datasource,
    )

    register_wod_datasource(spark)
    src = tmp_path / "incoming"
    (src / "APB" / "OBS").mkdir(parents=True)
    (src / "CTD" / "OBS").mkdir(parents=True)
    fixtures = "/root/reference/src/test/resources/wod"
    shutil.copy(f"{fixtures}/APB/OBS/APBO1997.gz", src / "APB" / "OBS" / "APBO1997.gz")

    stream = spark.readStream.format("wod_ascii").load(str(src))
    counts = stream.groupBy(F.col("ok.dataset").alias("ds")).count()
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wod_ds_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r.ds: r["count"] for r in spark.table("wod_ds_stream").collect()}
        assert set(first) == {"APB"} and first["APB"] > 0

        # second file arrives: only the delta is decoded, totals accumulate
        shutil.copy(f"{fixtures}/CTD/OBS/CTDO1971.gz", src / "CTD" / "OBS" / "CTDO1971.gz")
        q.processAllAvailable()
        second = {r.ds: r["count"] for r in spark.table("wod_ds_stream").collect()}
        assert second["APB"] == first["APB"]  # not reprocessed
        assert second.get("CTD", 0) > 0

        # no new files: another drain changes nothing
        q.processAllAvailable()
        third = {r.ds: r["count"] for r in spark.table("wod_ds_stream").collect()}
        assert third == second
    finally:
        q.stop()


def test_wod_datasource_stream_equals_batch(spark, tmp_path):
    """The streamed cast set equals the batch DataSource read of the same
    directory — one decoder, two planner surfaces."""
    import shutil

    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.sources.wod_datasource import (
        register_wod_datasource,
    )

    register_wod_datasource(spark)
    src = tmp_path / "dirin"
    (src / "APB" / "OBS").mkdir(parents=True)
    (src / "CTD" / "OBS").mkdir(parents=True)
    fixtures = "/root/reference/src/test/resources/wod"
    shutil.copy(f"{fixtures}/APB/OBS/APBO1997.gz", src / "APB" / "OBS" / "APBO1997.gz")
    shutil.copy(f"{fixtures}/CTD/OBS/CTDO1971.gz", src / "CTD" / "OBS" / "CTDO1971.gz")

    stream = spark.readStream.format("wod_ascii").load(str(src))
    key = stream.select(
        F.col("ok.dataset").alias("ds"), F.col("ok.castNumber").alias("cn")
    )
    q = (
        key.writeStream.outputMode("append")
        .format("memory")
        .queryName("wod_ds_flat")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {
        (r.ds, r.cn) for r in spark.table("wod_ds_flat").collect()
    }
    batch = {
        (r.ds, r.cn)
        for r in spark.read.format("wod_ascii")
        .load(str(src))
        .select(
            F.col("ok.dataset").alias("ds"), F.col("ok.castNumber").alias("cn")
        )
        .collect()
    }
    assert streamed == batch and streamed
