"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001 as a smoke check.
``queries()`` / ``oracle_sql()`` expose every registered operator from
SURVEY.md §2 (plus the LLM-data-pipeline extensions); the driver verifies
each against DuckDB at sf0.01 (row-count + schema + order-insensitive
value hash). Implementations live in ``wod_ascii_to_parquet_spark_spark/``;
this module is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (regional revenue 5-way join/agg) on sf0.001."""
    qs = load_all_operators()
    return qs["flagship_regional_revenue"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return {name: q.fn for name, q in load_all_operators().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    operators (custom hashing / streaming-trigger-dependent / partition-id
    outputs) are intentionally omitted."""
    return {
        name: q.oracle
        for name, q in load_all_operators().items()
        if q.oracle is not None
    }
