"""Bucketed-table join: assert the shuffle actually disappears."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.bucketing import (
    bucketed_join,
    write_bucketed,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    write_bucketed(orders, "bkt_orders", "o_custkey", 8)
    write_bucketed(customer, "bkt_customer", "o_custkey", 8)
    yield "bkt_orders", "bkt_customer"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_custkey")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_join_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_custkey")
    expected = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert joined.count() == expected
