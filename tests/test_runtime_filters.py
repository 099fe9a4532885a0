"""Runtime bloom-filter join pruning: the plan feature fires under the
opt-in context manager, never outside it, and cannot change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.runtime_filters import (
    runtime_bloom_filters,
)
from wod_ascii_to_parquet_spark_spark.registry import load

from .conftest import SF_DIR


def _fact_dim_join(spark):
    """Shuffle join (broadcast disabled) of the fact table against a
    selective dim filter — the shape runtime filters exist for."""
    li = load(spark, SF_DIR, "lineitem")
    o = load(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.hint("merge")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )


def _physical(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )


def test_bloom_filter_injected_and_result_unchanged(spark):
    baseline = _fact_dim_join(spark)
    plain_plan = _physical(baseline)
    assert "might_contain" not in plain_plan  # off by default at this scale
    expected = {tuple(r) for r in baseline.collect()}

    # At test scale every table is broadcastable and Catalyst's
    # isProbablyShuffleJoin gate (canBroadcastBySize) suppresses the rule —
    # a broadcast join has no shuffle to prune. Disable auto-broadcast
    # INSIDE the block to model the at-scale shape where neither side fits.
    with runtime_bloom_filters(
        spark, extra={"spark.sql.autoBroadcastJoinThreshold": "-1"}
    ):
        df = _fact_dim_join(spark)
        plan = _physical(df)
        assert "might_contain" in plan, plan[-2000:]
        assert "bloom_filter_agg" in plan
        got = {tuple(r) for r in df.collect()}
    assert got == expected

    # conf restored: the same build outside the block plans no filter
    assert "might_contain" not in _physical(_fact_dim_join(spark))
