"""Spark-4 surface semantics the oracle can't pin: HLL sketch accuracy
and the collation/variant edge behaviors worth guarding explicitly."""

from __future__ import annotations

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.operators.spark4_surface import (
    agg_hll_mergeable,
)
from wod_ascii_to_parquet_spark_spark.registry import load

from .conftest import SF_DIR


def test_hll_estimates_within_tolerance(spark):
    """Every HLL estimate (per-group and the unioned ALL row) lands within
    5% of the exact distinct count — the bound the sketch's default
    lgConfigK=12 (~1.6% standard error) comfortably meets."""
    est = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in agg_hll_mergeable(spark, SF_DIR).collect()
    }
    o = load(spark, SF_DIR, "orders")
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select(
        F.count_distinct("o_custkey").alias("n")
    ).collect()[0]["n"]
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1, 0.05 * n), (k, est[k], n)


def test_hll_union_consistent_with_merged_scan(spark):
    """Mergeability proper: union of per-group sketches == the sketch of
    the whole column (identical estimate, not merely close) — the property
    that makes stored per-shard sketches answer global rollups."""
    o = load(spark, SF_DIR, "orders")
    via_union = (
        o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    direct = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("n")
    ).collect()[0]["n"]
    assert via_union == direct


def test_collation_groups_fold_case_variants(spark):
    """Each case-insensitive group observes exactly 2 binary-distinct case
    variants (upper for even part keys, lower for odd) — i.e. the collated
    group-by genuinely folded rows a binary group-by keeps apart."""
    from wod_ascii_to_parquet_spark_spark.operators.spark4_surface import (
        string_collation_ci,
    )

    rows = string_collation_ci(spark, SF_DIR).collect()
    assert rows
    assert all(r["n_case_variants"] == 2 for r in rows)
    # and the ci-group count is strictly below the binary group count
    n_binary = (
        load(spark, SF_DIR, "part")
        .select(
            F.when(
                F.col("p_partkey") % 2 == 0, F.upper(F.col("p_type"))
            )
            .otherwise(F.lower(F.col("p_type")))
            .alias("m")
        )
        .distinct()
        .count()
    )
    assert len(rows) * 2 == n_binary


def test_variant_null_vs_missing(spark):
    """VARIANT's three-way null semantics: a JSON null is a PRESENT null
    value (is_variant_null=true), a missing path is SQL NULL from
    try_variant_get, and a type-mismatched typed get is SQL NULL too."""
    df = spark.range(1).select(
        F.parse_json(F.lit('{"a": null, "s": "x"}')).alias("v")
    )
    row = df.select(
        F.is_variant_null(F.variant_get("v", "$.a", "variant")).alias(
            "present_null"
        ),
        F.try_variant_get("v", "$.missing", "variant").alias("absent"),
        F.try_variant_get("v", "$.s", "bigint").alias("bad_cast"),
    ).collect()[0]
    assert row["present_null"] is True
    assert row["absent"] is None
    assert row["bad_cast"] is None
