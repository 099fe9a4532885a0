"""TPC-H-shaped analytical queries over the synthetic star schema —
multi-join + agg + sort showcases beyond the flagship (Q5 shape). These are
the canonical "does the optimizer do the right thing end-to-end" queries:
dim filters push into scans, dims broadcast, aggregations two-phase, top-k
via WindowGroupLimit/TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, rev_c100


@register(
    "q3_shipping_priority",
    """
    SELECT o_orderkey, o_orderdate AS odate, o_orderpriority,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c100
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, odate, o_orderpriority
    ORDER BY revenue_c100 DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch",),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, unfinished
    revenue per order, top-20."""
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_orderkey",
            F.col("o_orderdate").alias("odate"),
            "o_orderpriority",
        )
        .agg(
            # exact integer-cents revenue (registry.REV_C100_SQL rationale)
            F.sum(rev_c100()).alias("revenue_c100")
        )
        .orderBy(F.desc("revenue_c100"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_c100) AS BIGINT) AS revenue_c100
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS volume_c100
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch",),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: 5-way join with the nation dim joined TWICE under
    different roles (supplier vs customer nation) — alias-disambiguated
    self-joined dimension, both broadcast."""
    supplier = load(spark, sf_dir, "supplier")
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(rev_c100()).alias("revenue_c100")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c100,
           max(c_acctbal) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_c100 DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch",),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-items revenue per customer, top-20."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev_c100()).alias("revenue_c100"),
            F.max("c_acctbal").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue_c100"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, o_orderdate AS odate,
           round(total_qty, 2) AS total_qty
    FROM (
        SELECT o.o_custkey AS c_custkey, l.l_orderkey AS o_orderkey,
               o.o_orderdate, sum(l.l_quantity) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2, 3
    )
    WHERE total_qty > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
    tags=("tpch",),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-quantity orders via aggregate-then-filter (HAVING
    over a join), top-50."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("o_orderdate").alias("odate"),
        )
        .agg(F.sum("l_quantity").alias("__raw_qty"))
        .filter(F.col("__raw_qty") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "odate",
            F.round("__raw_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch",),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking — orders with at least one
    late-shipped lineitem (the synthetic schema lacks commit/receipt
    dates, so "late" = shipped after the order date), counted per
    priority. The EXISTS compiles to a LEFT SEMI join: the fact side is
    filtered before the join, the semi-join stops probing an order at its
    first match, and only (priority, partial count) reaches the final
    exchange."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
        GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    tags=("tpch",),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of order counts per customer — the
    double-aggregation pattern whose left join must PRESERVE zero-order
    customers (an inner join silently loses the c_count=0 bucket, the
    classic Q13 bug). The join filter rides in the JOIN condition, not a
    WHERE (which would also turn the outer join inner). First aggregate
    is per-customer (fact-sized shuffle), second is over the tiny
    (count → customers) histogram."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@register(
    "q22_sales_opportunity",
    """
    SELECT c_mktsegment, count(*) AS n_custs,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
    GROUP BY c_mktsegment
    """,
    tags=("tpch",),
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no HIGH-VALUE
    order (every synthetic customer has ordered, so the gate is priced to
    discriminate), per segment — an uncorrelated scalar subquery
    (evaluated once, broadcast into the scan filter) composed with a NOT
    EXISTS anti-join, then a small aggregate. The anti-join build side is
    just the distinct custkeys of qualifying orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .first()["a"]
    )
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
