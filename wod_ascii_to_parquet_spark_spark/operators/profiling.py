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

from ..registry import load, register

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
