"""Window-function operators (SURVEY.md §2.5) — parity set, absent in reference.

Determinism discipline: every ORDER BY inside a window carries a unique
tie-break column (o_orderkey) wherever row identity matters (row_number,
lag/lead, ntile, running sums); rank/dense_rank are tie-stable by
definition and may order by a non-unique key.

Scale notes (100 TB):
- A window = one hash shuffle on partitionBy keys + one in-partition sort.
  Chain windows over the SAME (partitionBy, orderBy) so Catalyst collapses
  them into a single Window operator (one shuffle+sort, many functions) —
  ``window_multi`` demonstrates this.
- A window with no partitionBy is a single-task bottleneck; never do it on
  big data (use groupBy-based alternatives or range partitioning).
- Skewed partition keys (one giant user) → salting or a two-level
  pre-aggregation before the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import load, register

_BYCUST = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )


@register(
    "window_row_number",
    f"""
    SELECT o_orderkey, o_custkey,
           row_number() OVER ({_BYCUST}) AS rn
    FROM orders
    """,
    tags=("window",),
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number with a unique tie-broken ordering."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", F.row_number().over(w).alias("rn")
    )


@register(
    "window_rank",
    """
    SELECT o_orderkey, o_custkey,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rnk
    FROM orders
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank(): ties share a rank, next rank skips."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate")
    return _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", F.rank().over(w).alias("rnk")
    )


@register(
    "window_dense_rank",
    """
    SELECT o_orderkey, o_custkey,
           dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS drnk
    FROM orders
    """,
    tags=("window",),
)
def window_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank(): ties share a rank, no gaps."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate")
    return _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", F.dense_rank().over(w).alias("drnk")
    )


@register(
    "window_lag_lead",
    f"""
    SELECT o_orderkey, o_custkey,
           lag(o_totalprice) OVER ({_BYCUST}) AS prev_price,
           lead(o_totalprice) OVER ({_BYCUST}) AS next_price
    FROM orders
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead neighbor access along a unique ordering."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    f"""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               {_BYCUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum over an unbounded-preceding row frame."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_similar,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS sum_similar
    FROM orders
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: includes all peers within a value distance — frame
    membership depends only on values, so it is tie-deterministic.
    (SQL formulation: the DataFrame ``rangeBetween`` API only takes long
    offsets, while the SQL RANGE frame supports fractional bounds on a
    double ORDER BY key.)"""
    _orders(spark, sf_dir).createOrReplaceTempView("__orders_rf")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               count(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS n_similar,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice
                   RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW), 2) AS sum_similar
        FROM __orders_rf
        """
    )


@register(
    "window_ntile",
    f"""
    SELECT o_orderkey, o_custkey,
           ntile(4) OVER ({_BYCUST}) AS quartile
    FROM orders
    """,
    tags=("window",),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile bucketing per partition."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window",),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group. Catalyst inserts a WindowGroupLimit (rank-limit
    pushdown) so each map task keeps only k rows per group before the
    shuffle — the scalable formulation of per-group top-k."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _orders(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_nth_value",
    f"""
    SELECT o_orderkey, o_custkey,
           nth_value(o_totalprice, 2) OVER (
               {_BYCUST}
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price
    FROM orders
    """,
    tags=("window",),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the full-partition frame."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_multi",
    f"""
    SELECT o_orderkey, o_custkey,
           row_number() OVER ({_BYCUST}) AS rn,
           round(sum(o_totalprice) OVER (
               {_BYCUST} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_spend,
           round(sum(o_totalprice) OVER (
               {_BYCUST} ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2)
               AS roll3_sum
    FROM orders
    """,
    tags=("window",),
)
def window_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several functions over one (partitionBy, orderBy) → Catalyst emits a
    single Window operator: one shuffle + one sort for all three outputs.
    (Rolling SUM, not avg: an average over a short frame lands exactly on
    half-cent rounding boundaries where engines' last-ulp noise diverges.)"""
    base = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    cum = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    ma = base.rowsBetween(-2, W.currentRow)
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(base).alias("rn"),
        F.round(F.sum("o_totalprice").over(cum), 2).alias("running_spend"),
        F.round(F.sum("o_totalprice").over(ma), 2).alias("roll3_sum"),
    )


@register(
    "window_percentile_position",
    f"""
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER ({_BYCUST}), 6) AS pct_rank,
           round(cume_dist() OVER ({_BYCUST}), 6) AS cume
    FROM orders
    """,
    tags=("window",),
)
def window_percentile_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist — relative rank positions, the remaining
    two ANSI window rank functions; both over the same (partitionBy,
    orderBy) so Catalyst emits ONE Window operator (single shuffle+sort).
    Ratios of integer ranks — cross-engine exact before rounding."""
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_gaps_islands",
    """
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      OR ts > lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                           + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    s AS (
        SELECT user_id, ts, sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_no
        FROM g
    )
    SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
           count(*) AS n_events, min(ts) AS sess_start, max(ts) AS sess_end
    FROM s GROUP BY user_id, sess_no
    """,
    tags=("window",),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization in batch: lag detects a >30-minute
    gap, a running sum of gap flags numbers the sessions, then one
    aggregate per (user, session). The classic two-window SQL pattern —
    same semantics as ``session_window`` but expressible in any engine,
    and the formulation used to BACKFILL history for a streaming session
    pipeline. Tie-broken by event_id so equal timestamps order
    identically in both engines; the gap is pure interval arithmetic
    (``prev + INTERVAL 30 MINUTE < ts``), valid on ntz timestamps with
    full microsecond precision — no epoch truncation. One shuffle on
    user_id shared by both windows and the final aggregate."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_ord)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTE")),
        1,
    ).otherwise(0)
    sess_no = F.sum("new_sess").over(
        w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.select("user_id", "event_id", "ts", new_sess.alias("new_sess"))
        .withColumn("sess_no", sess_no)
        .groupBy("user_id", "sess_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("sess_start"),
            F.max("ts").alias("sess_end"),
        )
    )


@register(
    "events_funnel_stages",
    """
    WITH w1 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t1
        FROM events
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                            AND ts <= t1 + INTERVAL 24 HOUR THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ), w3 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                            AND ts <= t2 + INTERVAL 24 HOUR THEN ts END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    )
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN t1 IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_viewed,
           CAST(count(DISTINCT CASE WHEN t2 IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_clicked,
           CAST(count(DISTINCT CASE WHEN t3 IS NOT NULL THEN user_id END)
                AS BIGINT) AS n_purchased
    FROM w3
    """,
    tags=("window", "events"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (view → click → purchase): each stage's timestamp
    is the earliest qualifying event AFTER the previous stage and within
    a 24 h stage deadline — the order-sensitive product-analytics query,
    NOT three independent existence checks. Expressed as a chain of min-over-user windows where
    each window's predicate references the previous window's result.

    Scale shape: all three Window operators share one partitioning
    (user_id), so the chain costs a single hash shuffle; the final stage
    counts are a 1-row global aggregate. A per-user ``applyInPandas``
    state machine would express longer/regex-like funnels; for fixed
    3-step funnels the window chain stays fully JVM-side."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = W.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))
                    & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))
                    & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct(
            F.when(F.col("t1").isNotNull(), F.col("user_id"))
        ).alias("n_viewed"),
        F.count_distinct(
            F.when(F.col("t2").isNotNull(), F.col("user_id"))
        ).alias("n_clicked"),
        F.count_distinct(
            F.when(F.col("t3").isNotNull(), F.col("user_id"))
        ).alias("n_purchased"),
    )


@register(
    "events_resample_gapfill",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi
        FROM events
    ),
    grid AS (
        SELECT et.event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM (SELECT DISTINCT event_type FROM events) et CROSS JOIN bounds
    ),
    hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n,
               round(avg(value), 6) AS avg_value
        FROM events GROUP BY event_type, hour
    )
    SELECT g.event_type, g.hour,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n,
           last_value(h.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_ff
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.hour = h.hour
    """,
    tags=("window", "timeseries"),
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill: a dense hourly grid per event
    type (generated, not observed — empty buckets EXIST with n=0), hourly
    aggregates left-joined on, and the average forward-filled across gaps
    with ``last(..., ignorenulls)`` — the standard
    downsample-then-carry-forward shape (time_bucket_gapfill / locf).

    Scale shape: the grid is |types| × |hours| — generated rows, tiny
    relative to the fact table; the only fact-sized work is the hourly
    two-phase aggregate. The forward-fill window partitions by type and
    orders by hour: state is one value per partition, streaming-friendly.
    The bucket average is rounded BEFORE the fill so the carried value is
    bit-identical across engines."""
    e = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = e.select("event_type").distinct()
    grid = (
        types.join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = e.groupBy(
        F.col("event_type").alias("h_type"), hour.alias("h_hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(
            hourly,
            (F.col("event_type") == F.col("h_type"))
            & (F.col("hour") == F.col("h_hour")),
            "left",
        )
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.last(F.col("avg_value"), ignorenulls=True)
            .over(w)
            .alias("avg_value_ff"),
        )
    )


@register(
    "events_retention_cohorts",
    """
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
    ),
    cohorts AS (
        SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_day, count(*) AS cohort_size FROM cohorts
        GROUP BY cohort_day
    )
    SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', c.cohort_day, a.day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active,
           round(CAST(count(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size, 6)
               AS retention
    FROM activity a
    JOIN cohorts c ON a.user_id = c.user_id
    JOIN sizes s ON s.cohort_day = c.cohort_day
    GROUP BY c.cohort_day, day_offset, s.cohort_size
    """,
    tags=("window", "events"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, and
    for every later activity day the distinct-active count plus the
    retention ratio against the cohort size — the other canonical
    product-analytics shape next to the funnel.

    Scale shape: activity collapses the fact table to distinct
    (user, day) FIRST (two-phase, tiny output), cohorts/sizes are
    user-level aggregates that ride the same user_id partitioning, and
    the final matrix is |cohorts| × |days| — dashboard-sized however big
    the fact table is. The ratio divides an exact count by an exact
    cohort size (one rounding at the end)."""
    e = load(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.join(cohorts, "user_id")
        .join(sizes, "cohort_day")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
            "cohort_size",
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "window_time_range_frame",
    """
    SELECT event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(avg(value) OVER w, 6) AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "timeseries"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based sliding window frame: per user, the trailing-1-hour
    event count and mean value at every event — `RANGE BETWEEN INTERVAL`
    semantics (frame bounds in event time, not row counts; peers with
    equal timestamps share a frame). Spark has no interval RANGE frame
    literal, so the order key is the epoch-microsecond projection and the
    bound is the interval in microseconds — semantically identical.

    Scale shape: one user_id shuffle + in-partition sort; frame state is
    the trailing hour's rows per user. This is the batch mirror of the
    sliding streaming window (`stream_sliding_counts`) evaluated at
    event granularity instead of grid granularity."""
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy(um.alias("um"))
        .rangeBetween(-3_600_000_000, 0)
    )
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
    )


@register(
    "events_top_transitions",
    """
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY n DESC, prev_type, next_type
    LIMIT 10
    """,
    tags=("window", "events"),
)
def events_top_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition mining: the most frequent consecutive
    (previous → next) event-type pairs per user stream — lag over the
    per-user time order, then a global bigram count. The (ts, event_id)
    order key makes simultaneous events deterministic.

    Scale shape: one user_id shuffle for the lag window; the bigram
    count is |types|² groups however large the stream; top-k via
    TakeOrderedAndProject."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "prev_type", "next_type")
        .limit(10)
    )


@register(
    "orders_pareto_share",
    """
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c100
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, rev_c100,
               CAST(sum(rev_c100) OVER (ORDER BY rev_c100 DESC, o_custkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_c100,
               CAST(sum(rev_c100) OVER () AS BIGINT) AS total_c100
        FROM cust
    )
    SELECT o_custkey, rev_c100,
           round(CAST(cum_c100 AS DOUBLE) / total_c100, 6) AS cum_share,
           CASE WHEN cum_c100 * 10 <= total_c100 * 8 THEN 'A'
                WHEN cum_c100 * 100 <= total_c100 * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY rev_c100 DESC, o_custkey
    LIMIT 500
    """,
    tags=("window", "analytics"),
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC analysis: customers ranked by revenue with their running
    cumulative share and an A/B/C class at the 80%/95% boundaries — the
    classic "which 20% of customers drive 80% of revenue" query. The
    class boundaries compare exact integers (``cum·10 ≤ total·8``), so no
    float boundary can flip between engines.

    Scale shape: the per-customer aggregate is two-phase; the running sum
    is a GLOBAL ordered window — the one legitimately global window in
    the repo (output is customer-sized, not fact-sized; at extreme
    customer counts, two-pass per-partition-prefix-sum replaces it)."""
    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev_c100")
        )
    )
    w_run = (
        W.orderBy(F.desc("rev_c100"), F.asc("o_custkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy()
    ranked = cust.select(
        "o_custkey",
        "rev_c100",
        F.sum("rev_c100").over(w_run).cast("bigint").alias("cum_c100"),
        F.sum("rev_c100").over(w_all).cast("bigint").alias("total_c100"),
    )
    return (
        ranked.select(
            "o_custkey",
            "rev_c100",
            F.round(
                F.col("cum_c100").cast("double") / F.col("total_c100"), 6
            ).alias("cum_share"),
            F.when(
                F.col("cum_c100") * 10 <= F.col("total_c100") * 8, "A"
            )
            .when(F.col("cum_c100") * 100 <= F.col("total_c100") * 95, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
        .orderBy(F.desc("rev_c100"), "o_custkey")
        .limit(500)
    )


@register(
    "sales_yoy_growth",
    """
    WITH yearly AS (
        SELECT n_name, year(o_orderdate) AS yr,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c100
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name, yr
    )
    SELECT cur.n_name, cur.yr, cur.rev_c100,
           round(CAST(cur.rev_c100 AS DOUBLE) / prev.rev_c100 - 1, 6)
               AS yoy_growth
    FROM yearly cur
    JOIN yearly prev ON cur.n_name = prev.n_name AND cur.yr = prev.yr + 1
    ORDER BY cur.n_name, cur.yr
    """,
    tags=("tpch", "analytics"),
)
def sales_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per nation: an aggregate self-joined to
    itself at ``yr = yr + 1`` — the TPC-DS-style reporting shape (the
    window-lag formulation is equivalent; the self-join form is the one
    that generalizes to non-adjacent comparisons and is the classic
    optimizer test for aggregate reuse). Growth divides two exact
    BIGINTs and rounds once."""
    yearly = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev_c100")
        )
    )
    prev = yearly.select(
        F.col("n_name").alias("p_name"),
        F.col("yr").alias("p_yr"),
        F.col("rev_c100").alias("p_rev"),
    )
    return (
        yearly.join(
            prev,
            (F.col("n_name") == F.col("p_name"))
            & (F.col("yr") == F.col("p_yr") + 1),
        )
        .select(
            "n_name",
            "yr",
            "rev_c100",
            F.round(
                F.col("rev_c100").cast("double") / F.col("p_rev") - 1, 6
            ).alias("yoy_growth"),
        )
        .orderBy("n_name", "yr")
    )


@register(
    "window_offset_rows_frame",
    """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), 6)
               AS prior3_avg
    FROM events
    """,
    tags=("window",),
)
def window_offset_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An OFFSET rows frame that excludes the current row — the trailing
    baseline (`avg of the previous 3 events`) used for anomaly scoring
    ("is this value out of line with what this user just did"). First
    event per user has an empty frame → NULL baseline, preserved."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, -1)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("prior3_avg"),
    )


@register(
    "events_dau_wau",
    """
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    contrib AS (
        SELECT user_id, day + CAST(i AS INTEGER) AS wday, i = 0 AS is_today
        FROM activity, unnest(generate_series(0, 6)) AS g(i)
    ),
    daily AS (
        SELECT CAST(wday AS VARCHAR) AS day,
               CAST(count(DISTINCT CASE WHEN is_today THEN user_id END)
                    AS BIGINT) AS dau,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib GROUP BY wday
    )
    SELECT day, dau, wau,
           round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
    FROM daily
    WHERE dau > 0
    ORDER BY day
    """,
    tags=("window", "events"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day. Spark windows cannot
    do COUNT(DISTINCT) over a sliding frame, so each (user, active-day)
    contributes itself to the 7 future days it keeps the user "weekly
    active" — a map-only ×7 explode of the ALREADY-distinct (user, day)
    relation, then one exact distinct-count aggregate per day. Days with
    no activity (dau=0, trailing-only) are excluded.

    Scale shape: the explode multiplies the day-distinct activity
    relation (users × days, tiny vs the fact table), never raw events;
    the aggregate is the standard two-shuffle distinct expand."""
    activity = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    contrib = activity.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
    ).select(
        "user_id",
        F.date_add(F.col("day"), F.col("i")).alias("wday"),
        (F.col("i") == 0).alias("is_today"),
    )
    daily = contrib.groupBy(
        F.col("wday").cast("string").alias("day")
    ).agg(
        F.count_distinct(
            F.when(F.col("is_today"), F.col("user_id"))
        ).alias("dau"),
        F.count_distinct("user_id").alias("wau"),
    )
    return (
        daily.filter(F.col("dau") > 0)
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@register(
    "customer_rfm_segments",
    """
    WITH base AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate), TIMESTAMP '2001-09-01')
                   AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_c100
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_c100,
               ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
               ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               ntile(4) OVER (ORDER BY monetary_c100 DESC, o_custkey) AS m_score
        FROM base
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_c100) AS BIGINT) AS segment_rev_c100
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("window", "analytics"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days before the dataset
    horizon), Frequency, and Monetary value, each quartile-scored with
    ``ntile(4)`` (custkey tie-break makes the tiles deterministic), then
    rolled up to the 4×4×4 segment grid — the standard CRM cohorting
    query. Scale note: the three global ntiles run over the CUSTOMER
    aggregate, not the fact table; at extreme customer counts swap ntile
    for percentile thresholds (`curation_quality_gate` pattern) to avoid
    the single-partition window."""
    base = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit("2001-09-01").cast("timestamp"), F.max("o_orderdate")
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("monetary_c100"),
        )
    )
    scored = base.select(
        "monetary_c100",
        F.ntile(4)
        .over(W.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(W.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(W.orderBy(F.desc("monetary_c100"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_c100").cast("bigint").alias("segment_rev_c100"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "events_anomaly_zscore",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               count(*) AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    roll AS (
        SELECT event_type, hour, n,
               count(n) OVER w AS m,
               sum(n) OVER w AS s1,
               sum(n * n) OVER w AS s2
        FROM hourly
        WINDOW w AS (
            PARTITION BY event_type
            ORDER BY CAST(epoch(hour) / 3600 AS BIGINT)
            RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, hour, n,
           round(z, 6) AS zscore,
           CASE WHEN abs(round(z, 6)) >= 3.0 THEN 1 ELSE 0 END AS is_anomaly
    FROM (
        SELECT *,
               (n - s1 / m)
               / sqrt((s2 - s1 * s1 / m) / (m - 1)) AS z
        FROM roll WHERE m >= 12 AND (s2 - s1 * s1 / m) > 0
    )
    """,
    tags=("window", "events"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on hourly event volumes: each
    (event_type, hour) bucket is scored against the TRAILING 24 HOURS —
    a RANGE frame over epoch-hour ids, so gap hours genuinely narrow the
    baseline rather than letting a ROWS frame silently reach back days
    across a sparse period (current bucket excluded — a spike must not
    inflate its own baseline). Flagged at |z| ≥ 3; warm-up windows
    (< 12 populated trailing buckets) and zero-variance baselines emit
    nothing rather than fake scores.

    Cross-engine discipline: mean/std come from the SAME explicit
    running-sum formula (Σx, Σx², n over an identical RANGE frame on
    epoch-hour ids) in both engines — ``stddev_samp`` over a frame would leave each engine free
    to accumulate differently; the flag compares the ROUNDED score so the
    |z|=3 boundary is identical. Shape: one hourly pre-aggregate
    (map-side combined — the shuffle carries buckets, not events), one
    window over (event_type, hour); at 100 TB/day this is the standard
    streaming-ops monitor downsampled to whatever bucket width keeps the
    per-key frame in memory."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    hour_id = (F.unix_timestamp("hour") / 3600).cast("bigint")
    w = (
        W.partitionBy("event_type")
        .orderBy(hour_id)
        .rangeBetween(-24, -1)
    )
    roll = hourly.select(
        "event_type",
        "hour",
        "n",
        F.count("n").over(w).alias("m"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("m")
    z = (F.col("n") - F.col("s1") / F.col("m")) / F.sqrt(
        var_num / (F.col("m") - 1)
    )
    zr = F.round(z, 6)
    return (
        roll.filter((F.col("m") >= 12) & (var_num > 0))
        .select(
            "event_type",
            "hour",
            "n",
            zr.alias("zscore"),
            F.when(F.abs(zr) >= 3.0, 1).otherwise(0).alias("is_anomaly"),
        )
    )


@register(
    "events_bot_regularity",
    """
    WITH gaps AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                 ))) AS BIGINT) AS gap
        FROM events
    ),
    stats AS (
        SELECT user_id,
               count(gap) AS n_gaps,
               CAST(sum(gap) AS DOUBLE) AS s1,
               CAST(sum(gap * gap) AS DOUBLE) AS s2
        FROM gaps WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
           round(cv, 6) AS gap_cv,
           CASE WHEN round(cv, 6) < 0.1 THEN 1 ELSE 0 END AS bot_flag
    FROM (
        SELECT user_id, n_gaps,
               sqrt(greatest(0, s2 - s1 * s1 / n_gaps) / (n_gaps - 1))
               / (s1 / n_gaps) AS cv
        FROM stats WHERE n_gaps >= 20 AND s1 > 0
    )
    """,
    tags=("window", "events"),
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness via inter-event REGULARITY: per user, the coefficient
    of variation of gaps between consecutive events — humans are bursty
    (cv ≳ 1), schedulers and scripts tick (cv → 0), so a low-cv account
    with enough events is the automation signal rate-limiters and
    engagement metrics both need. The lag is tie-broken by event_id so
    equal-timestamp events order identically in both engines; mean/std
    come from the same explicit Σ, Σ² formulas as the anomaly detector
    (variance numerator clamped at 0 — cancellation on near-constant gaps
    must read as cv=0, not a NaN/exception engine divergence) and the
    flag compares the ROUNDED cv, keeping the 0.1 boundary hash-exact. One user_id shuffle for the lag window; the stats
    aggregate rides the same partitioning."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    gaps = ev.select(
        "user_id",
        (ep - F.unix_timestamp(F.lag("ts").over(w))).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("gap").alias("n_gaps"),
        F.sum("gap").cast("double").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n_gaps"), F.col("s1"), F.col("s2")
    # clamp the variance numerator: fp cancellation on near-constant gaps
    # (exactly the bot population) can push it epsilon-negative — DuckDB's
    # sqrt would raise, Spark would NaN; zero (cv=0, perfect bot) is the
    # correct reading for both
    var_num = F.greatest(F.lit(0.0), s2 - s1 * s1 / n)
    cv = F.sqrt(var_num / (n - 1)) / (s1 / n)
    cvr = F.round(cv, 6)
    return (
        stats.filter((n >= 20) & (s1 > 0))
        .select(
            "user_id",
            n.cast("bigint").alias("n_gaps"),
            cvr.alias("gap_cv"),
            F.when(cvr < 0.1, 1).otherwise(0).alias("bot_flag"),
        )
    )


@register(
    "events_funnel_timing",
    """
    WITH t AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT CAST(floor(epoch(t_buy)) AS BIGINT)
               - CAST(floor(epoch(t_view)) AS BIGINT) AS secs
        FROM t WHERE t_view IS NOT NULL AND t_buy IS NOT NULL
          AND t_buy > t_view
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(secs, 0.5), 4) AS p50_secs,
           round(quantile_cont(secs, 0.9), 4) AS p90_secs,
           CAST(max(secs) AS BIGINT) AS max_secs
    FROM conv
    """,
    tags=("window", "events"),
)
def events_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel TIMING — the half of funnel analysis `events_funnel_stages`
    (conversion counts) doesn't answer: for users who converted
    (first view strictly before first purchase), the distribution of
    time-to-convert — median, p90, worst case. The number a growth team
    actually tunes against: a p90 of days means the funnel leaks in
    consideration, of minutes means checkout. One user_id-grouped
    pre-aggregate (two conditional mins), then one small exact-percentile
    aggregate over |converted users| rows — exact is affordable because
    the percentile runs per corpus, not per group; both engines use
    linear interpolation (percentile / quantile_cont) on floored-second
    gaps."""
    ev = load(spark, sf_dir, "events")
    t = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("t_buy"),
    )
    secs = F.unix_timestamp("t_buy") - F.unix_timestamp("t_view")
    conv = t.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select(secs.alias("secs"))
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(secs, 0.5)"), 4).alias("p50_secs"),
        F.round(F.expr("percentile(secs, 0.9)"), 4).alias("p90_secs"),
        F.max("secs").alias("max_secs"),
    )


@register(
    "events_session_depth",
    """
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      OR ts > lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                           + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    s AS (
        SELECT user_id, sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sess_no
        FROM g
    ),
    depth AS (
        SELECT user_id, sess_no, count(*) AS n_events
        FROM s GROUP BY user_id, sess_no
    )
    SELECT CAST(least(n_events, 10) AS BIGINT) AS depth_band,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM depth GROUP BY least(n_events, 10)
    """,
    tags=("window", "events"),
)
def events_session_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution: sessions from the same 30-minute
    gaps-and-islands rule as `window_gaps_islands`, rolled into a
    banded histogram (1..9 events, 10 = "10+") of how deep sessions go —
    the engagement profile behind bounce rate (band 1) and power usage
    (band 10+). Composition discipline: the sessionization CTE is
    verbatim the oracled gaps-islands query, so this adds only the
    banding on top of already-verified semantics; the band cap keeps the
    output small and hash-stable at any scale. Same single user_id
    shuffle; both aggregates ride it."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr("INTERVAL 30 minutes")),
        1,
    ).otherwise(0)
    s = ev.select(
        "user_id",
        F.sum(new_sess).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("sess_no"),
    )
    depth = s.groupBy("user_id", "sess_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    band = F.least(F.col("n_events"), F.lit(10)).cast("bigint")
    return depth.groupBy(band.alias("depth_band")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "customer_repurchase_latency",
    """
    WITH gaps AS (
        SELECT o_custkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT)
               - CAST(floor(epoch(lag(o_orderdate) OVER (
                     PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ))) AS BIGINT) AS gap_secs
        FROM orders
    )
    SELECT CAST(count(*) AS BIGINT) AS n_repurchases,
           round(quantile_cont(gap_secs / 86400.0, 0.5), 4) AS p50_days,
           round(quantile_cont(gap_secs / 86400.0, 0.9), 4) AS p90_days,
           round(avg(gap_secs / 86400.0), 4) AS mean_days
    FROM gaps WHERE gap_secs IS NOT NULL
    """,
    tags=("window", "events"),
)
def customer_repurchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPURCHASE latency — the distribution of time between a customer's
    consecutive orders (median/p90/mean days): the retention cadence
    behind replenishment reminders and churn-risk windows (a customer
    past their own p90 is lapsing). Same shape discipline as the funnel
    timing: one custkey-partitioned lag (tie-broken by orderkey for
    equal dates), floored-second gaps so both engines' epoch handling
    agrees, one small exact-percentile aggregate over the gap rows."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = (
        F.unix_timestamp("o_orderdate")
        - F.unix_timestamp(F.lag("o_orderdate").over(w))
    )
    gaps = o.select("o_custkey", gap.alias("gap_secs")).filter(
        F.col("gap_secs").isNotNull()
    )
    days = F.col("gap_secs") / 86400.0
    return gaps.agg(
        F.count(F.lit(1)).alias("n_repurchases"),
        F.round(F.expr("percentile(gap_secs / 86400.0, 0.5)"), 4).alias(
            "p50_days"
        ),
        F.round(F.expr("percentile(gap_secs / 86400.0, 0.9)"), 4).alias(
            "p90_days"
        ),
        F.round(F.avg(days), 4).alias("mean_days"),
    )
