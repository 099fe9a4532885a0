"""Lakehouse table-format connectors — gated on their jars being present.

Delta Lake / Iceberg / Hudi need their runtime jars on the session
classpath; this environment ships none, so the constructors probe and fail
with a clear error instead of an opaque ClassNotFoundException. The
capability they'd unlock (native MERGE INTO, time travel, OPTIMIZE) is
emulated format-agnostically elsewhere (``operators/sql_surface.py::
merge_upsert``, the convert plan's atomic-publish protocol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class LakehouseUnavailable(RuntimeError):
    pass


def _probe(spark: SparkSession, classname: str, fmt: str) -> None:
    try:
        spark._jvm.java.lang.Class.forName(classname)  # type: ignore[union-attr]
    except Exception as e:
        raise LakehouseUnavailable(
            f"{fmt} runtime jars are not on the classpath; add them via "
            f"spark.jars.packages to enable {fmt} tables"
        ) from e


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _probe(spark, "org.apache.spark.sql.delta.DeltaLog", "Delta Lake")
    return spark.read.format("delta").load(path)  # pragma: no cover


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    _probe(spark, "org.apache.iceberg.spark.SparkCatalog", "Iceberg")
    return spark.read.format("iceberg").load(table)  # pragma: no cover


def merge_into_delta(
    spark: SparkSession, target_path: str, updates: DataFrame, key: str
) -> None:
    """Native MERGE INTO (Delta): upsert ``updates`` into the Delta table
    at ``target_path`` on ``key``. Requires the Delta jars (probe below);
    without them use ``operators.sql_surface.merge_upsert`` — the
    format-agnostic anti-join + union emulation with identical semantics
    (that arm is the one exercised by tests/oracle in this environment)."""
    _probe(spark, "org.apache.spark.sql.delta.DeltaLog", "Delta Lake")
    updates.createOrReplaceTempView("__merge_updates")  # pragma: no cover
    spark.sql(  # pragma: no cover
        f"MERGE INTO delta.`{target_path}` AS t "
        f"USING __merge_updates AS u ON t.{key} = u.{key} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
