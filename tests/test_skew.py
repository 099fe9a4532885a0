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


def test_salt_spreads_hot_key_with_constant_value(spark):
    """Regression: a hot key whose rows all share ONE value must still
    spread across salts (a value-derived salt collapses to a single one)."""
    from pyspark.sql import functions as F2

    df = spark.range(10_000).select(
        F2.lit("hot").alias("k"), F2.lit(1.0).alias("v")
    )
    salted = df.withColumn(
        "__salt",
        F2.pmod(F2.xxhash64(F2.monotonically_increasing_id()), F2.lit(16)),
    )
    n_distinct = salted.select("__salt").distinct().count()
    assert n_distinct >= 12  # ~16 expected; must not be 1

    out = two_level_agg(df, "k", "v", n_salts=16).collect()
    assert len(out) == 1 and out[0]["n"] == 10_000 and out[0]["sum_v"] == 10_000.0


def test_salt_is_deterministic_across_materializations(spark):
    """The per-row salt must be a pure function of durable row identity so
    shuffle-retry recomputation cannot reassign it: two independent
    materializations of the salted frame must agree row-for-row."""
    from wod_ascii_to_parquet_spark_spark.plans.skew import _row_salt

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    salted = df.withColumn("__salt", _row_salt(df, 16, None))
    one = {(r["o_orderkey"], r["__salt"]) for r in salted.collect()}
    two = {(r["o_orderkey"], r["__salt"]) for r in salted.collect()}
    assert one == two
    assert len({s for _, s in one}) > 1  # actually spreads
