"""The remaining TPC-H query shapes (Q2..Q21) adapted to the testdata star
schema.

The synthetic schema has no ``partsupp`` table and no
``l_shipmode/l_commitdate/l_receiptdate`` columns, so each query keeps the
*optimizer shape* of its TPC-H namesake (the join topology, subquery
nesting, and predicate structure that make the query interesting) while
substituting available columns:

- supply relationships come from ``SELECT DISTINCT l_partkey, l_suppkey``
  (the observed supplier-of-part pairs),
- ``ps_supplycost`` stands in as ``s_acctbal`` (Q2) / ``p_retailprice``
  (Q9, Q11),
- "late" lineitems are ``l_shipdate > o_orderdate + 60 days`` (Q12, Q21).

Q1's shape is ``agg_group_sum_avg`` (aggregations.py); Q3/Q4/Q7/Q10/Q13/
Q18/Q22 live in tpch_like.py; the flagship is the Q5 join topology without
the local-supplier constraint — ``q5_local_supplier`` below adds it.

Numeric discipline: every money aggregate is exact integer arithmetic
(see registry.REV_C100_SQL); ratios divide two exact BIGINTs (IEEE-identical
across engines) and round once at the end.

Scale notes (100 TB): every query is dim-filter → fact join → two-phase
agg. nation/region are explicit broadcasts; supplier/part are left to AQE
(at real scale part is a fact-sized table — hash join on the key is the
right default, and the partkey shuffle is shared by the groupBy where one
follows). The DISTINCT supply-pair derivation is a partkey-partitioned
hash aggregate — one shuffle, reused by the subsequent partkey join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..registry import REV_C100_SQL, load, register, rev_c100

def _supply_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed (partkey, suppkey) supply pairs — the partsupp stand-in.

    One hash-aggregate shuffle on (partkey, suppkey); downstream partkey
    joins reuse the same hash partitioning (Exchange reuse, no second
    shuffle on the pair set).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )


@register(
    "q2_min_cost_supplier",
    """
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               row_number() OVER (PARTITION BY p_partkey
                                  ORDER BY s_acctbal, s_suppkey) AS rn
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 7 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
    ) WHERE rn = 1
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch",),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part argmin over the supply relationship (min-cost
    supplier per part, cost ≡ s_acctbal), restricted to one region — the
    classic correlated-MIN subquery, expressed as a windowed top-1 so the
    supply pairs are scanned once instead of twice."""
    ps = _supply_pairs(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 7) & (F.col("p_type") == "STANDARD")
    )
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        ps.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c100
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue_c100 DESC
    """,
    tags=("tpch",),
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 proper: the flagship's topology PLUS the local-supplier
    constraint (customer and supplier share a nation) — a two-condition
    join where one side of each equality arrives from a different branch
    of the tree."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(rev_c100()).alias("revenue_c100"))
        .orderBy(F.desc("revenue_c100"))
    )


@register(
    "q6_revenue_forecast",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_c100
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch",),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure scan-filter-aggregate — every predicate (date range,
    discount band, quantity cap) must reach the parquet reader as a pushed
    filter; the plan is a single WholeStageCodegen span with zero
    shuffles beyond the final 1-row combine."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                * F.round(F.col("l_discount") * 100, 0).cast("bigint")
            ).alias("revenue_c100")
        )
    )


@register(
    "q8_market_share",
    """
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume_c100
                               ELSE 0 END) AS DOUBLE)
                 / sum(volume_c100), 6) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume_c100,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch",),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: national market share — 8-way join with nation in two roles,
    then a conditional-sum / total-sum ratio per year. Both sums are exact
    BIGINTs so the single division is IEEE-identical across engines."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = rev_c100().alias("volume_c100")
    joined = (
        part.join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol, "supp_nation")
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_5", F.col("volume_c100")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume_c100"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    """
    SELECT n_name, o_year,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    - CAST(round(p_retailprice * 100) AS BIGINT)
                      * CAST(round(l_quantity) AS BIGINT) * 100)
                AS BIGINT) AS profit_c10000
    FROM (
        SELECT n_name, year(o_orderdate) AS o_year,
               l_extendedprice, l_discount, p_retailprice, l_quantity
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    )
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
    tags=("tpch",),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-line profit by supplier nation and year;
    ``p_retailprice`` stands in for ``ps_supplycost`` (no partsupp table).
    Profit is exact 1e-4-dollar integers: revenue minus quantity × cost."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = rev_c100() - (
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
        * F.round(F.col("l_quantity"), 0).cast("bigint")
        * F.lit(100)
    )
    return (
        part.join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).alias("profit_c10000"))
        .orderBy("n_name", F.desc("o_year"))
    )


@register(
    "q11_important_stock",
    """
    WITH part_value AS (
        SELECT l_partkey AS partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS value_c100
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT partkey, value_c100
    FROM part_value
    WHERE value_c100 > (SELECT CAST(sum(value_c100) * 0.001 AS DOUBLE)
                        FROM part_value)
    ORDER BY value_c100 DESC, partkey
    """,
    tags=("tpch",),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value for one nation's suppliers, kept only
    where the part exceeds a fraction of the TOTAL value — a group-agg
    compared against a scalar aggregate of itself. The scalar side is a
    1-row broadcast (BroadcastNestedLoopJoin), never a shuffle; the
    fraction threshold keeps the semantics scale-invariant."""
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    value = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .alias("value_c100")
        )
    )
    total = value.agg(
        (F.sum("value_c100") * F.lit(0.001)).cast("double").alias("threshold")
    )
    return (
        value.join(F.broadcast(total))
        .filter(F.col("value_c100") > F.col("threshold"))
        .select("partkey", "value_c100")
        .orderBy(F.desc("value_c100"), "partkey")
    )


@register(
    "q12_late_shipments",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("tpch",),
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: late-shipment priority split — a cross-table predicate
    (shipdate vs orderdate+interval, which cannot push below the join) and
    the classic conditional-count pair. "Late" ≡ shipped >60 days after
    order (no l_commitdate/l_receiptdate in this schema)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_effect",
    """
    SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                       THEN rev_c100 ELSE 0 END) AS DOUBLE)
                 / sum(rev_c100), 6) AS promo_revenue
    FROM (
        SELECT p_type,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_c100
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    )
    """,
    tags=("tpch",),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promotion revenue share over one month — date-pruned fact scan
    joined to part, conditional-sum over total-sum ratio of exact
    integers."""
    lineitem = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("p_type"), rev_c100().alias("rev_c100"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("rev_c100"))
                    .otherwise(F.lit(0))
                ).cast("double")
                / F.sum("rev_c100"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
                   AS total_revenue_c100
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_c100
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_c100 = (SELECT max(total_revenue_c100) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch",),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: top supplier by quarterly revenue — a derived view compared
    against its own scalar MAX (exact BIGINT equality, so the "all ties"
    semantics are deterministic). The scalar arrives by 1-row broadcast."""
    revenue = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_c100()).alias("total_revenue_c100"))
    )
    top = revenue.agg(F.max("total_revenue_c100").alias("max_rev"))
    return (
        load(spark, sf_dir, "supplier")
        .join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("total_revenue_c100") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue_c100")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_count",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch",),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) over
    the supply relationship, excluding a NOT IN subquery of flagged
    suppliers (negative balance stands in for complaint comments). The
    NOT IN compiles to a broadcast anti-join (keys are non-null)."""
    ps = _supply_pairs(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    flagged = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(flagged),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity",
    """
    SELECT CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                           AS DOUBLE) / 7.0) AS BIGINT) AS avg_yearly_c100
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS agg_partkey,
               CAST(sum(round(l_quantity)) AS BIGINT) AS sum_qty,
               count(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    ) pq ON agg_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND 5 * CAST(round(l_quantity) AS BIGINT) * cnt < sum_qty
    """,
    tags=("tpch",),
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: small-quantity-order revenue — each lineitem compared against
    the per-part average quantity (correlated scalar subquery, decorrelated
    into a group-agg + rejoin). The comparison ``qty < 0.2·avg`` is done in
    exact integers as ``5·qty·cnt < sum_qty`` so both engines agree at the
    boundary."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(F.round(F.col("l_quantity"), 0)).cast("bigint").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("agg_partkey") == F.col("l_partkey"))
        .filter(
            F.lit(5) * F.round(F.col("l_quantity"), 0).cast("bigint") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.round(
                F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
                .cast("double")
                / 7.0
            )
            .cast("bigint")
            .alias("avg_yearly_c100")
        )
    )


@register(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c100
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch",),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs across both join sides. Catalyst extracts the
    common per-side implications (brand∈{...}, size ≤ 15, quantity ≤ 30)
    and pushes them below the join while keeping the exact disjunction as
    the post-join filter — the classic CNF-extraction test."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(rev_c100()).alias("revenue_c100"))
    )


@register(
    "q20_potential_promotion",
    """
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'small%'
          GROUP BY l_suppkey, l_partkey
          HAVING CAST(sum(round(l_quantity)) AS BIGINT) > 80
      )
    ORDER BY s_name
    """,
    tags=("tpch",),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who moved a large quantity of a product line —
    IN-subquery over a grouped HAVING over a join, i.e. the nested-IN
    chain, decorrelated to agg → semi-join. The per-(supplier, part)
    quantity threshold replaces the partsupp availqty comparison; the
    nation filter of textbook Q20 is dropped (the smallest test SF has too
    few suppliers per nation to keep the query non-vacuous)."""
    heavy = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0)).cast("bigint").alias("qty"))
        .filter(F.col("qty") > 80)
        .select("l_suppkey")
    )
    nation = load(spark, sf_dir, "nation")
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch",),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who kept multi-supplier orders waiting — an
    EXISTS plus a correlated inequality NOT EXISTS against the same fact
    table ("last to ship" ≡ no co-supplier shipped later; shipdate stands
    in for receiptdate/commitdate). Both subqueries decorrelate to one
    per-order aggregate over co-suppliers, so lineitem is scanned twice,
    not three times, and the join is a single orderkey shuffle."""
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    l1 = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    others = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("l_shipdate").alias("o2_shipdate"),
    )
    exists = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    not_exists = exists.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey"))
        & (F.col("o2_shipdate") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        not_exists.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "nation_trade_flows",
    f"""
    WITH flows AS (
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               sum({REV_C100_SQL}) AS rev_c100
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE ns.n_nationkey <> nc.n_nationkey
        GROUP BY ns.n_name, nc.n_name
    )
    SELECT a.supp_nation, a.cust_nation,
           CAST(a.rev_c100 AS BIGINT) AS export_c100,
           CAST(coalesce(b.rev_c100, 0) AS BIGINT) AS import_c100,
           CAST(a.rev_c100 - coalesce(b.rev_c100, 0) AS BIGINT)
               AS net_balance_c100
    FROM flows a
    LEFT JOIN flows b
      ON b.supp_nation = a.cust_nation AND b.cust_nation = a.supp_nation
    """,
    tags=("tpch", "join"),
)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full NATION-PAIR trade matrix — Q7 generalized from two fixed
    nations to every directed pair, with each flow's reverse flow joined
    back for the NET BALANCE (exports − imports, exact integer cents).
    The international-trade report shape: a 6-way star join producing a
    |nations|² matrix, then a self-join of the (tiny) aggregate with the
    pair key reversed. All dimension sides broadcast; the only fact
    shuffle is the orderkey join; the flows×flows self-join runs on a
    |nations|²-row frame — driver-invisible at any scale."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    flows = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("sk"),
                                  F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n1.select(F.col("n_nationkey").alias("ck"),
                                  F.col("n_name").alias("cust_nation"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .filter(F.col("sk") != F.col("ck"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev_c100()).alias("rev_c100"))
    )
    rev = flows.select(
        F.col("supp_nation").alias("r_supp"),
        F.col("cust_nation").alias("r_cust"),
        F.col("rev_c100").alias("rev_rev"),
    )
    return (
        flows.join(
            rev,
            (F.col("r_supp") == F.col("cust_nation"))
            & (F.col("r_cust") == F.col("supp_nation")),
            "left",
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.col("rev_c100").cast("bigint").alias("export_c100"),
            F.coalesce(F.col("rev_rev"), F.lit(0))
            .cast("bigint")
            .alias("import_c100"),
            (F.col("rev_c100") - F.coalesce(F.col("rev_rev"), F.lit(0)))
            .cast("bigint")
            .alias("net_balance_c100"),
        )
    )
