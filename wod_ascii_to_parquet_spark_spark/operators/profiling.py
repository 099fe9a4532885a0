"""Dataset profiling — the data-quality pass a pipeline runs before
training on (or publishing) a new 100 TB drop: per-column null counts,
exact distinct cardinalities, and min/max ranges, emitted as one long-form
(column_name, stats...) relation.

Single-pass shape: ALL per-column measures are computed in ONE aggregate
over one scan (the multi-count-distinct compiles to Spark's expand plan —
rows are replicated per distinct-column in the shuffle, the scan still
happens once), then pivoted to long form with ``stack``. The naive
alternative — one aggregate query per column, unioned — scans the table
once per column and is exactly what this operator exists to avoid. At
100 TB the exact distinct counts are the expensive half; the sketch arm of
this family is ``agg_approx_count_distinct`` (HLL++, one pass, no expand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, rev_c100

_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_count,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM orders
        """
        for c in _COLS
    ]
    return " UNION ALL ".join(parts)


@register("profile_columns", _oracle(), tags=("profiling",))
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of ``orders``: null_count / exact n_distinct /
    min / max per column, one scan, long-form output."""
    orders = load(spark, sf_dir, "orders")
    aggs = []
    for c in _COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nc"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nc`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in _COLS
    )
    return wide.selectExpr(
        f"stack({len(_COLS)}, {stack_args})"
        " as (column_name, null_count, n_distinct, min_val, max_val)"
    )


@register(
    "profile_category_drift",
    """
    WITH cut AS (
        SELECT (CAST(epoch(min(o_orderdate)) AS BIGINT)
                + CAST(epoch(max(o_orderdate)) AS BIGINT)) // 2 AS mid
        FROM orders
    ),
    half AS (
        SELECT o_orderpriority AS cat,
               CASE WHEN CAST(epoch(o_orderdate) AS BIGINT) < cut.mid
                    THEN 'early' ELSE 'late' END AS period
        FROM orders CROSS JOIN cut
    ),
    cnt AS (
        SELECT cat,
               count(*) FILTER (WHERE period = 'early') AS n_early,
               count(*) FILTER (WHERE period = 'late') AS n_late
        FROM half GROUP BY cat
    ),
    tot AS (
        SELECT CAST(sum(n_early) AS DOUBLE) AS te,
               CAST(sum(n_late) AS DOUBLE) AS tl
        FROM cnt
    )
    SELECT CAST(count(*) AS BIGINT) AS n_categories,
           CAST(count(*) - 1 AS BIGINT) AS dof,
           round(sum(
               power(n_early - (n_early + n_late) * te / (te + tl), 2)
                   / ((n_early + n_late) * te / (te + tl))
               + power(n_late - (n_early + n_late) * tl / (te + tl), 2)
                   / ((n_early + n_late) * tl / (te + tl))
           ), 6) AS chi2
    FROM cnt CROSS JOIN tot WHERE te > 0 AND tl > 0
    """,
    tags=("profiling",),
)
def profile_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical DRIFT detection — the chi-square homogeneity statistic
    between the early and late halves of the order stream (split at the
    median date) over the priority distribution: the scheduled check a
    pipeline runs to catch upstream mix shifts (a new source, a changed
    default, an enum rename) before they poison trained consumers. Output
    is the statistic + degrees of freedom; compare against the χ²
    critical value for the alert threshold (the CDF itself is the
    caller's table — no SciPy in the plan). Two grouped counts and a
    1-row broadcast total; the shuffle carries categories, not rows.
    Identical expected-count arithmetic on both engines, rounded."""
    o = load(spark, sf_dir, "orders")
    ep = F.unix_timestamp("o_orderdate")
    cut = o.agg(
        ((F.min(ep) + F.max(ep)) / 2).cast("bigint").alias("mid")
    )
    half = o.crossJoin(F.broadcast(cut)).select(
        F.col("o_orderpriority").alias("cat"),
        F.when(ep < F.col("mid"), "early").otherwise("late").alias("period"),
    )
    cnt = half.groupBy("cat").agg(
        F.count_if(F.col("period") == "early").alias("n_early"),
        F.count_if(F.col("period") == "late").alias("n_late"),
    )
    tot = cnt.agg(
        F.sum("n_early").cast("double").alias("te"),
        F.sum("n_late").cast("double").alias("tl"),
    )
    ne, nl = F.col("n_early"), F.col("n_late")
    te, tl = F.col("te"), F.col("tl")
    exp_e = (ne + nl) * te / (te + tl)
    exp_l = (ne + nl) * tl / (te + tl)
    term = F.pow(ne - exp_e, 2) / exp_e + F.pow(nl - exp_l, 2) / exp_l
    return cnt.crossJoin(F.broadcast(tot)).filter(
        (te > 0) & (tl > 0)  # degenerate split (single-date table):
        # both engines then aggregate zero rows to the same
        # (0, -1, NULL) row instead of dividing by a zero expected count
    ).agg(
        F.count(F.lit(1)).alias("n_categories"),
        (F.count(F.lit(1)) - 1).alias("dof"),
        F.round(F.sum(term), 6).alias("chi2"),
    )


@register(
    "supplier_concentration_hhi",
    """
    WITH rev AS (
        SELECT p.p_type AS segment, l.l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS DOUBLE) AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_type, l.l_suppkey
    ),
    seg AS (SELECT segment, sum(rev) AS total FROM rev GROUP BY segment)
    SELECT r.segment,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(sum(power(r.rev / s.total, 2)) * 10000, 4) AS hhi
    FROM rev r JOIN seg s ON s.segment = r.segment
    GROUP BY r.segment
    """,
    tags=("profiling",),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier CONCENTRATION per part segment — the Herfindahl–Hirschman
    index (Σ share², ×10,000 in the antitrust convention: <1,500
    competitive, >2,500 concentrated) over exact-integer-cents revenue
    shares. The supply-chain risk metric a procurement review runs: a
    segment scoring high depends on few suppliers and one failure is an
    outage. Two grouped aggregates (map-side combined) + a |segments|-row
    join; shares are exact because revenue stays integer cents until the
    final ratio."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_type").alias("segment"), "l_suppkey")
        .agg(F.sum(rev_c100()).cast("double").alias("rev"))
    )
    seg = rev.groupBy("segment").agg(F.sum("rev").alias("total"))
    return (
        rev.join(seg, "segment")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.pow(F.col("rev") / F.col("total"), 2)) * 10_000, 4
            ).alias("hhi"),
        )
    )
