"""Stage-level timing of a warm convert_file: scan build, write job,
observation get, footer attach, sidecar — 6 warm runs to find the floor
(directive r7->r8 #5)."""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark

spark = get_spark(app_name="convstage", master="local[32]", shuffle_partitions=32)

from wod_ascii_to_parquet_spark_spark.plans.convert import (
    SIDECAR_NAME,
    _geometry_col,
    _join,
)
from wod_ascii_to_parquet_spark_spark.plans.geo_metadata import (
    attach_geo_footer,
    geo_sidecar_bytes,
)
from wod_ascii_to_parquet_spark_spark.sources.filesystem import FsClient
from wod_ascii_to_parquet_spark_spark.sources.wod_ascii import ok_casts, wod_scan
from wod_ascii_to_parquet_spark_spark.functions.geohash import geohash_col

SRC = "/root/reference/src/test/resources/wod/XBT/OBS/XBTO1967.gz"
fs = FsClient(spark)

for i in range(6):
    out = tempfile.mkdtemp(prefix="convstage_")
    try:
        stages = {}
        t0 = time.perf_counter()
        parsed = wod_scan(spark, SRC, dataset="XBT", scatter=True)
        obs = Observation(f"e{i}")
        parsed = parsed.observe(
            obs, F.sum(F.when(F.col("err").isNotNull(), 1).otherwise(0)).alias("n_err")
        )
        seconds = (F.col("time") * 3600).cast("int")
        casts = (
            ok_casts(parsed)
            .withColumn(
                "castTimestamp",
                F.try_add(
                    F.expr(
                        "try_to_timestamp(concat(year, '-', lpad(month, 2, '0'), "
                        "'-', lpad(day, 2, '0')))"
                    ),
                    F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), seconds),
                ),
            )
            .withColumn("geohash", geohash_col("latitude", "longitude"))
            .withColumn("geohash3", F.substring("geohash", 1, 3))
            .withColumn("geometry", _geometry_col("point"))
        )
        stages["plan_build"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            casts.repartition(16, F.col("geohash3"))
            .sortWithinPartitions("geohash3", "geohash")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("geohash3")
            .parquet(out)
        )
        stages["write_job"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        nerr = int(obs.get["n_err"] or 0)
        stages["obs_get"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        attach_geo_footer(fs, out, spark=spark, encoding="point")
        stages["footer"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        fs.write_bytes(_join(out, SIDECAR_NAME), geo_sidecar_bytes("point"))
        stages["sidecar"] = time.perf_counter() - t0

        print(
            {"run": i, "n_err": nerr}
            | {k: round(v, 3) for k, v in stages.items()}
            | {"total": round(sum(stages.values()), 3)},
            flush=True,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
