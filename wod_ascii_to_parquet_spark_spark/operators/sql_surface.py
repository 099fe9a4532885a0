"""Extended SQL surface: subqueries, null-safe joins, conditional
aggregates, unpivot, intervals, casts, bitwise ops, inline sources.

Everything here is stock Catalyst (SURVEY §4.2 — zero custom rules); the
point is capability parity of the full query surface a user of a SQL engine
expects, each entry oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "scalar_conditional",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_decoded,
           greatest(o_totalprice, 250000.0) AS at_least_mid,
           least(o_totalprice, 250000.0) AS at_most_mid
    FROM orders
    """,
    tags=("scalar",),
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/greatest/least conditional scalars."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300_000, "high")
        .when(F.col("o_totalprice") >= 100_000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_decoded"
        ),
        F.greatest("o_totalprice", F.lit(250_000.0)).alias("at_least_mid"),
        F.least("o_totalprice", F.lit(250_000.0)).alias("at_most_mid"),
    )


@register(
    "agg_conditional",
    """
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           round(sum(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END), 2)
               AS bulk_revenue,
           CASE WHEN bool_or(l_tax > 0.07) THEN 1 ELSE 0 END AS any_high_tax,
           CASE WHEN bool_and(l_quantity > 0) THEN 1 ELSE 0 END AS all_positive_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered and boolean aggregates (FILTER clause, bool_or/bool_and)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(
                F.when(F.col("l_quantity") > 25, F.col("l_extendedprice")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("bulk_revenue"),
        F.when(F.bool_or(F.col("l_tax") > 0.07), 1).otherwise(0).alias("any_high_tax"),
        F.when(F.bool_and(F.col("l_quantity") > 0), 1)
        .otherwise(0)
        .alias("all_positive_qty"),
    )


@register(
    "agg_collect_sorted",
    """
    SELECT c_nationkey,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey)
               AS custkeys
    FROM customer
    WHERE c_custkey < 40
    GROUP BY c_nationkey
    """,
    tags=("agg",),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic list aggregation: collect → sort → join. (An unsorted
    collect_list is nondeterministic under parallel execution — always
    sort before exposing collected arrays.)"""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 40)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.collect_list("c_custkey")),
                lambda x: x.cast("string"),
            ),
        ).alias("custkeys")
    )


@register(
    "window_first_last",
    """
    SELECT o_orderkey, o_custkey,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over full-partition frames."""
    from pyspark.sql import Window as W

    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    full = base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(base).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
    )


@register(
    "window_distribution",
    """
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
    """,
    tags=("window",),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist distribution functions."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_totalprice")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "unpivot_stack",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 200
    """,
    tags=("reshape",),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot via ``stack`` (generator expression — no shuffle,
    row count × k)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .selectExpr(
            "l_orderkey",
            "l_linenumber",
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) AS (measure, val)",
        )
    )


@register(
    "join_null_safe",
    """
    WITH c AS (SELECT c_custkey,
                      CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_nationkey END
                          AS nkey
               FROM customer WHERE c_custkey < 50),
         s AS (SELECT s_suppkey,
                      CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END
                          AS nkey
               FROM supplier)
    SELECT c_custkey, s_suppkey
    FROM c JOIN s ON c.nkey IS NOT DISTINCT FROM s.nkey
    """,
    tags=("join",),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — still hashable, still an
    equi-join physically (no nested loop)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(
            "c_custkey",
            F.when(F.col("c_custkey") % 5 == 0, None)
            .otherwise(F.col("c_nationkey"))
            .alias("nkey_c"),
        )
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nkey_s"),
    )
    return c.join(s, F.col("nkey_c").eqNullSafe(F.col("nkey_s"))).select(
        "c_custkey", "s_suppkey"
    )


@register(
    "subquery_scalar",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >
                     (SELECT avg(o_totalprice) FROM orders) THEN 1 ELSE 0 END
               AS above_avg
    FROM orders
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → Catalyst evaluates it once and
    broadcasts the scalar into the main scan."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey,
               CASE WHEN o_totalprice >
                         (SELECT avg(o_totalprice) FROM __orders_sq)
                    THEN 1 ELSE 0 END AS above_avg
        FROM __orders_sq
        """
    )


@register(
    "subquery_in",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 8000)
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → planned as a left-semi join."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_in")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM __orders_in
        WHERE o_custkey IN
            (SELECT c_custkey FROM __customer_in WHERE c_acctbal > 8000)
        """
    )


@register(
    "subquery_correlated_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("subquery",),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated by Catalyst into a semi join on the
    correlation key (no per-row subquery execution)."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_ce")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM __customer_ce c
        WHERE EXISTS (SELECT 1 FROM __orders_ce o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        """
    )


@register(
    "interval_arith",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 DAY AS plus_3d,
           o_orderdate + INTERVAL 2 MONTH AS plus_2m,
           CAST(o_orderdate - INTERVAL 1 YEAR AS TIMESTAMP) AS minus_1y,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS as_date
    FROM orders
    """,
    tags=("scalar",),
)
def interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp ± INTERVAL arithmetic and date casting."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")).alias("plus_3d"),
        (F.col("o_orderdate") + F.expr("INTERVAL 2 MONTH")).alias("plus_2m"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 YEAR"))
        .cast("timestamp")
        .alias("minus_1y"),
        # date-cast demo, re-cast to TIMESTAMP: a bare DATE column reaches
        # pandas as datetime.date (Spark) vs datetime64 (DuckDB) and the
        # driver's stringified hash diverges.
        F.col("o_orderdate").cast("date").cast("timestamp").alias("as_date"),
    )


@register(
    "cast_matrix",
    """
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor_int,
           CAST(o_orderstatus = 'O' AS INT) AS is_open_int,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    """,
    tags=("scalar",),
)
def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-type casts (int↔string, bool→int, date→string). Double→int is
    deliberately via explicit floor: raw CAST rounding differs between
    engines (Spark truncates, DuckDB rounds)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor_int"),
        (F.col("o_orderstatus") == "O").cast("int").alias("is_open_int"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@register(
    "bitwise_funcs",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           o_orderkey << 2 AS shifted_l,
           o_orderkey >> 3 AS shifted_r,
           bit_count(o_orderkey) AS popcount
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("scalar",),
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/or/xor/shifts/popcount over integer keys."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "regexp_extract_groups",
    """
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#(0*)([1-9][0-9]*|0)', 2) AS cust_num,
           CASE WHEN regexp_matches(c_name, '^Customer#[0-9]+$') THEN 1 ELSE 0 END
               AS well_formed
    FROM customer
    """,
    tags=("scalar",),
)
def regexp_extract_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction + full-match predicate."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", "Customer#(0*)([1-9][0-9]*|0)", 2).alias(
            "cust_num"
        ),
        F.when(F.col("c_name").rlike("^Customer#[0-9]+$"), 1)
        .otherwise(0)
        .alias("well_formed"),
    )


@register(
    "range_source",
    """
    SELECT CAST(i % 10 AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(i) AS BIGINT) AS total
    FROM range(100000) t(i) GROUP BY 1
    """,
    tags=("scan",),
)
def range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic distributed source (``spark.range`` — parallel, no input
    files); the generator-side of a benchmark/data-gen workload."""
    return (
        spark.range(100_000)
        .select((F.col("id") % 10).alias("bucket"), F.col("id"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").cast("bigint").alias("total"))
    )


@register(
    "struct_ops",
    """
    SELECT o_orderkey,
           struct_extract(struct_pack(status := o_orderstatus,
                                      price := o_totalprice), 'status')
               AS s_status,
           round(struct_extract(struct_pack(status := o_orderstatus,
                                            price := o_totalprice), 'price'), 2)
               AS s_price
    FROM orders WHERE o_orderkey < 1000
    """,
    tags=("scalar",),
)
def struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (the nested-row primitive the WOD
    cast schema is built from)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    s = F.struct(
        F.col("o_orderstatus").alias("status"), F.col("o_totalprice").alias("price")
    )
    return o.select(
        "o_orderkey",
        s.getField("status").alias("s_status"),
        F.round(s.getField("price"), 2).alias("s_price"),
    )


@register("sample_deterministic", None, tags=("scan", "rows-only"))
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE — engines use different RNG streams so
    the row SET is engine-specific (rows-only), but a fixed seed makes the
    Spark result reproducible run-to-run (asserted by the determinism
    check)."""
    return (
        load(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_custkey")
    )


@register(
    "recursive_cte_hierarchy",
    """
    WITH RECURSIVE h(part, root, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT c.p_partkey, h.root, h.depth + 1
        FROM part c JOIN h ON h.part = c.p_partkey // 10
        WHERE c.p_partkey >= 10
    )
    SELECT part, root, CAST(depth AS INT) AS depth FROM h
    """,
    tags=("subquery",),
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI recursive CTE (Spark 4's WITH RECURSIVE): walk the implicit
    part hierarchy parent(p) = p div 10 from the ten roots down, emitting
    every part's root and depth — the bill-of-materials / org-chart shape
    that needed an iterative driver loop (the connected-components
    pattern) before recursive CTEs landed in the engine.

    Execution: each recursion level is one join of the frontier against
    the part scan — the same per-round shuffle shape as the hand-rolled
    loop in ``dedup_cluster_assign``, but planned and iterated entirely
    inside the engine (bounded by spark.sql.cteRecursionLevelLimit; depth
    here is 4). The oracle runs the identical statement in DuckDB
    (integer division spelled ``//`` there, ``DIV`` here)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("__part_rc")
    return spark.sql(
        """
        WITH RECURSIVE h(part, root, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM __part_rc WHERE p_partkey < 10
            UNION ALL
            SELECT c.p_partkey, h.root, h.depth + 1
            FROM __part_rc c JOIN h ON h.part = c.p_partkey DIV 10
            WHERE c.p_partkey >= 10
        )
        SELECT part, root, CAST(depth AS INT) AS depth FROM h
        """
    )


@register(
    "subquery_correlated_scalar",
    """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem l1
    WHERE l_quantity = (SELECT min(l_quantity) FROM lineitem l2
                        WHERE l2.l_orderkey = l1.l_orderkey)
    """,
    tags=("subquery",),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRELATED scalar aggregate subquery (the Q2/Q17 pattern): each
    outer row compares against an aggregate over its own group. Catalyst
    de-correlates it into an aggregate + join on the correlation key —
    i.e. the rewrite a user would hand-write (groupBy + min + equi-join)
    happens inside the optimizer; at scale the de-correlated plan is one
    extra fact-keyed aggregation, never a per-row subquery execution."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_cs")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM __li_cs l1
        WHERE l_quantity = (SELECT min(l_quantity) FROM __li_cs l2
                            WHERE l2.l_orderkey = l1.l_orderkey)
        """
    )


@register(
    "subquery_not_in_null",
    """
    WITH nk AS (
        SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
        FROM customer
    )
    SELECT
        CAST((SELECT count(*) FROM orders WHERE o_custkey NOT IN
                  (SELECT k FROM nk)) AS BIGINT) AS n_not_in,
        CAST((SELECT count(*) FROM orders o WHERE NOT EXISTS
                  (SELECT 1 FROM nk WHERE nk.k = o.o_custkey)) AS BIGINT)
            AS n_not_exists
    """,
    tags=("subquery", "semantics"),
)
def subquery_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tri-valued-logic NOT IN trap, demonstrated and cross-engine
    pinned: the subquery list contains a NULL (negative-balance customers
    are nulled out), so ANSI ``NOT IN`` can never be TRUE — count 0 —
    while ``NOT EXISTS`` over the same list gives the answer people
    usually mean. Spark plans the NOT IN as a null-aware anti join
    (NAAJ, broadcast-only by design); both engines must agree on BOTH
    counts."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_naaj")
    return spark.sql(
        """
        WITH nk AS (
            SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
            FROM __customer_naaj
        )
        SELECT
            CAST((SELECT count(*) FROM __orders_naaj WHERE o_custkey NOT IN
                      (SELECT k FROM nk)) AS BIGINT) AS n_not_in,
            CAST((SELECT count(*) FROM __orders_naaj o WHERE NOT EXISTS
                      (SELECT 1 FROM nk WHERE nk.k = o.o_custkey)) AS BIGINT)
                AS n_not_exists
        """
    )


@register(
    "subquery_exists_flag",
    """
    SELECT c_custkey,
           EXISTS(SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > 400000) AS has_big_order
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("subquery",),
)
def subquery_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a PROJECTED boolean (not a filter): every customer kept,
    annotated with whether a large order exists — the existence-join
    shape, which Spark decorrelates to a LEFT OUTER join + null test
    instead of a semi-join (semi would drop the FALSE rows)."""
    for t in ("orders", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__{t}_ef")
    return spark.sql(
        """
        SELECT c_custkey,
               EXISTS(SELECT 1 FROM __orders_ef
                      WHERE o_custkey = c_custkey
                        AND o_totalprice > 400000) AS has_big_order
        FROM __customer_ef
        ORDER BY c_custkey
        """
    )


@register(
    "pandas_api_groupby",
    """
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_c100
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("api", "pandas"),
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PANDAS API ON SPARK surface (`df.pandas_api()` →
    `pyspark.pandas`): the groupby/agg a pandas user writes verbatim,
    executed as a distributed Catalyst plan — `.to_spark()` hands back
    the same DataFrame world the rest of the registry lives in, and the
    oracle pins the translation's semantics, not just that it runs. This
    completes the user-facing API matrix (SQL, DataFrame, pandas API,
    UDF/UDTF, Python DataSource): a pandas-shaped workload ports by
    changing the import, and the plan underneath is the same two-phase
    hash aggregate as `agg_group_sum_avg`. Cents are computed BEFORE the
    pandas-API hop so the sum stays exact-integer on both engines."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    pdf = o.pandas_api()
    out = (
        pdf.groupby("o_orderstatus")
        .agg(n=("o_orderkey", "count"), total_c100=("cents", "sum"))
        .reset_index()
    )
    return out.to_spark().select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        F.col("total_c100").cast("bigint").alias("total_c100"),
    )
