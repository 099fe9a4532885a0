"""Aggregation operators (SURVEY.md §2.4).

Absent in the reference (its only aggregation is driver-side key-set
counting, ``OsPoolS3Lister.java:86-106``); this is the declared parity set.

Scale notes (100 TB):
- Every groupBy below is Catalyst's two-phase hash aggregate: map-side
  partial agg → shuffle only the partial states → final agg. The shuffle
  volume is O(|groups| × partitions), not O(rows).
- ``count_distinct`` expands to a two-shuffle expand/agg plan; prefer
  ``approx_count_distinct`` (HLL++, single pass, fixed-size state) for
  high-cardinality keys at scale.
- rollup/cube/grouping-sets use the Expand operator: each input row is
  replicated once per grouping set *before* the partial agg — cube on k
  columns multiplies map output by 2^k; keep k small, or compute the base
  aggregate once and re-aggregate it (see docstring of ``agg_cube``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, rev_c100


@register(
    "agg_group_sum_avg",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_c100,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_group_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: 2 keys, 8 aggregates, one pass."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.sum(rev_c100()).alias("sum_disc_c100"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (two-shuffle expand plan)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register("agg_approx_count_distinct", None, tags=("agg", "rows-only"))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch distinct-count — the 100 TB answer to count-distinct
    (single pass, mergeable fixed-size state, no expand shuffle). Rows-only:
    sketch estimates are engine-specific."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_n_parts"))
    )


@register(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping_id disambiguation."""
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


@register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube = Expand × 2^k before partial agg. At 100 TB prefer: base
    groupBy(a, b) once, then rollup the (tiny) base result — same answer,
    2^k× less map output."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS aggregation (SQL surface)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_having",
    """
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING sum(o_totalprice) > 1500000.0
    """,
    tags=("agg",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter; Catalyst evaluates it on the final
    agg output (group-count rows, not input rows)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("__raw"),
        )
        .filter(F.col("__raw") > 1_500_000.0)
        .drop("__raw")
    )


@register(
    "agg_median_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles. At 100 TB use
    ``F.percentile_approx`` (t-digest-like sketch, mergeable) instead —
    exact percentile materializes per-group sorted state."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        )
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev/variance/correlation/covariance per group."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "cov_qty_price"
            ),
        )
    )


@register(
    "agg_linear_regression",
    """
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI linear-regression aggregates (regr_slope/intercept/r2/count):
    price-vs-quantity fit per return flag — single-pass mergeable moments,
    the same two-phase hash shape as every other aggregate (no sorted
    state, scale-safe)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "slope"
            ),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 2
            ).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
    )


@register("agg_approx_percentile", None, tags=("agg", "rows-only"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles (`percentile_approx`, mergeable KLL-like state) —
    the 100 TB replacement for exact per-group sorted-state percentiles.
    Rows-only: sketch boundaries are engine-specific; accuracy is bounded
    by the 1/accuracy parameter (tested against exact in
    tests/test_consistency.py)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 1000).alias("approx_median"),
            F.percentile_approx("o_totalprice", 0.9, 1000).alias("approx_p90"),
        )
    )


@register("agg_histogram", None, tags=("agg", "rows-only"))
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram sketch (``histogram_numeric``) flattened to
    (bucket centroid, height) rows — distribution profiling in one pass.
    Rows-only: centroid placement is engine-specific."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.histogram_numeric("o_totalprice", F.lit(8)).alias("hist"))
        .select(
            "o_orderstatus",
            F.posexplode("hist").alias("bucket_idx", "bucket"),
        )
        .select(
            "o_orderstatus",
            "bucket_idx",
            F.round(F.col("bucket.x"), 2).alias("centroid"),
            F.col("bucket.y").cast("bigint").alias("height"),
        )
    )


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at scale — that is an extra job over the full input)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "agg_mode_deterministic",
    """
    SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
        SELECT l_returnflag, l_quantity, count(*) AS n,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY count(*) DESC, l_quantity
               ) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
    tags=("agg",),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a DETERMINISTIC tie-break
    (lowest value wins) — the built-in ``mode()`` leaves ties
    engine-/partition-order-specific, so cross-engine pipelines need this
    count + row_number formulation. Two-phase count aggregation, then a
    groups-sized window (|groups × distinct values| rows, not the fact
    table)."""
    from pyspark.sql import Window as W

    counts = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", F.col("l_quantity").alias("mode_qty"), "n"
        )
    )


@register(
    "agg_listagg_bool",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
               AS statuses,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT)
               AS n_bulk,
           bool_and(l_discount <= 0.1) AS all_discount_ok,
           bool_or(l_tax > 0.07) AS any_high_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "ansi"),
)
def agg_listagg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI ordered string aggregation + boolean/filtered aggregate
    surface in one pass: ``LISTAGG ... WITHIN GROUP (ORDER BY ...)``
    (Spark 4) vs DuckDB's ``string_agg(... ORDER BY ...)``, plus
    ``count_if``/``FILTER``, ``bool_and``, ``bool_or``. The WITHIN GROUP
    ordering is what makes listagg deterministic and hash-checkable —
    unordered listagg output is partition-order-dependent by definition."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "listagg(DISTINCT l_linestatus, ',')"
                " WITHIN GROUP (ORDER BY l_linestatus)"
            ).alias("statuses"),
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.bool_and(F.col("l_discount") <= 0.1).alias("all_discount_ok"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram_exact",
    """
    SELECT CAST(least(floor((p_retailprice - 900.0) / 2.0), 9) AS BIGINT)
               AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(p_retailprice), 2) AS lo,
           round(max(p_retailprice), 2) AS hi
    FROM part
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg",),
)
def agg_histogram_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact fixed-width histogram (width_bucket semantics via integer
    banding): 10 × $2 buckets over the retail-price range, last bucket
    clamped — the ORACLED arm of the histogram pair (`agg_histogram` is
    the engine-sketch arm, rows-only by nature). Bucketing is
    ``floor((x - lo)/w)`` on exact inputs, a single two-phase aggregate."""
    p = load(spark, sf_dir, "part")
    bucket = F.least(
        F.floor((F.col("p_retailprice") - 900.0) / 2.0), F.lit(9)
    ).cast("bigint")
    return (
        p.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_retailprice"), 2).alias("lo"),
            F.round(F.max("p_retailprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )
