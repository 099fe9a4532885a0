"""Salted-join / two-level-agg equivalence with the plain formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.skew import salted_join, two_level_agg

from .conftest import SF_DIR


def test_salted_join_equivalent(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", n_salts=4).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_level_agg_equivalent(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_o_totalprice"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    skew_safe = two_level_agg(orders, "o_orderstatus", "o_totalprice", n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, skew_safe.collect())
    )
