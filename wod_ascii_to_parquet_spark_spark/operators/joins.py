"""Join operators J1–J10 (SURVEY.md §2.3).

The reference has no relational joins — only the cartesian task expansion
(``SparklerExecutor.java:60-69``), the "output exists" skip check
(semi-join shape, ``DatasetYearTrain.java:92``) and the S3 inventory diff
(anti-join shape, ``OsPoolS3Lister.java:106``). This module provides full
join capability, Spark-first.

Scale notes (100 TB):
- Equi-joins shuffle both sides on the key → sort-merge by default; AQE may
  demote to shuffled-hash or broadcast at runtime. Dimension tables
  (region/nation/part-sized) are explicitly ``F.broadcast`` hinted — a
  broadcast join is shuffle-free on the fact side.
- The theta/range join keeps the small side tiny (a literal band table) so
  Spark picks BroadcastNestedLoopJoin — the only sane physical plan for a
  non-equi predicate; never range-join two large sides directly, bucket the
  range key first (see ``asof_join``).
- The as-of join is implemented as equi-join on the partition key +
  per-left-row window top-1 — one shuffle on the equi key. Without an equi
  key, bucketize the time axis and equi-join on the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "join_inner_equi",
    """
    SELECT o_orderkey, o_custkey, c_name, c_acctbal
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain inner equi-join on the customer key."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "o_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_broadcast",
    """
    SELECT l_orderkey, l_linenumber, p_brand, p_type
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    tags=("join",),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join: dimension ships to every executor, fact side never
    shuffles. The go-to plan for fact⋈dim at any scale."""
    lineitem = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey).select(
        "l_orderkey", "l_linenumber", "p_brand", "p_type"
    )


@register(
    "join_left_outer",
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: unmatched customers survive with NULL order columns."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_right_outer",
    """
    SELECT c_custkey, c_name, o_orderkey
    FROM orders RIGHT JOIN customer ON c_custkey = o_custkey
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (mirror of the left-outer case)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return orders.join(customer, customer.c_custkey == orders.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_full_outer",
    """
    SELECT c_custkey, s_suppkey, s_name
    FROM customer FULL JOIN supplier ON c_custkey = s_suppkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: both unmatched sides survive."""
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    return customer.join(supplier, customer.c_custkey == supplier.s_suppkey, "full").select(
        "c_custkey", "s_suppkey", "s_name"
    )


@register(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: the "does output already exist" skip check shape
    (``DatasetYearTrain.java:92``). Emits left columns only, no row
    multiplication."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: the S3 inventory diff (``OsPoolS3Lister.java:106``,
    ``all.removeAll(success)``) as a distributed operator. Orders with no
    lineitems — nonempty in this testdata (~1.7% of orders), so the check
    is not vacuous (the previous customers-without-orders diff was always
    empty: every customer has orders here)."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    return orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


@register(
    "join_cross",
    "SELECT n_name, r_name FROM nation CROSS JOIN region",
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — the reference's datasets × processingLevels task
    expansion (``SparklerExecutor.java:63-67``). Only ever with a broadcast
    side; an unbounded cross of two large inputs is a plan bug."""
    nation = load(spark, sf_dir, "nation").select("n_name")
    region = load(spark, sf_dir, "region").select("r_name")
    return nation.crossJoin(F.broadcast(region))


_BANDS = [
    (0.0, 50_000.0, "xs"),
    (50_000.0, 150_000.0, "s"),
    (150_000.0, 300_000.0, "m"),
    (300_000.0, 450_000.0, "l"),
    (450_000.0, 1e18, "xl"),
]

_BANDS_SQL = ", ".join(f"({lo}, {hi}, '{b}')" for lo, hi, b in _BANDS)


@register(
    "join_theta_range",
    f"""
    SELECT band, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) bands(lo, hi, band)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    tags=("join",),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-predicate) join → BroadcastNestedLoopJoin against a tiny
    banding dim. The general large×large range join must bucketize instead
    (see ``asof_join`` scale note)."""
    orders = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "lo double, hi double, band string")
    return (
        orders.join(
            F.broadcast(bands),
            (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
) -> DataFrame:
    """As-of join (backward): latest right row with right_ts <= left_ts per key.

    Implementation: equi-join on ``on`` with the range predicate, then window
    top-1 per left row — one shuffle on the equi key, fully JVM-side.

    100 TB note: when the per-key match multiplicity is large, use
    :func:`asof_join_bucketed` (equi-join on (key, time-bucket) + carried
    per-bucket maxima — bounded intermediate at any multiplicity) or the
    cogrouped ``pd.merge_asof`` variant (``join_asof_pandas``). This
    formulation is correct at any scale but materializes |matches| rows
    into the argmax aggregate.
    """
    lcols = [F.col(f"l.{c}") for c in left.columns]
    rnames = [c for c in right.columns if c != on]
    joined = left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")),
        "inner",
    )
    # TWO-PASS argmax (r16): ``max_by(payload_struct, ordering_struct)``
    # partial-combines map-side (|left| rows shuffled, not |matches|) but
    # its struct buffer is not UnsafeRow-mutable, so Spark plans
    # SortAggregate — a partial SORT over the |matches| join output and a
    # final sort over |left| rows. Splitting the argmax keeps every
    # aggregation HashAggregate (fixed-width buffers): pass 1 takes
    # ``max(right_ts)`` per left row over the |matches| stream; pass 2
    # re-joins the right side on (key, right_ts == best_ts) — a
    # |left|-sized probe whose multiplicity is only same-timestamp ties —
    # and resolves the tie by ``max(tiebreak)``. Identical result by the
    # ordering-struct semantics (max ts first, then max tiebreak among
    # ties; payload of that row). Measured wall 1.31 → 0.55 s / CPU
    # 1.96 → 1.19 s at sf0.1, pairwise in every interleaved round
    # (tools/exp_asof_twopass.py, identity asserted on all 100k rows).
    best_ts = joined.groupBy(*lcols).agg(
        F.max(F.col(f"r.{right_ts}")).alias("__best_ts")
    )
    rejoined = best_ts.alias("b").join(
        right.alias("r2"),
        (F.col(f"b.{on}") == F.col(f"r2.{on}"))
        & (F.col(f"r2.{right_ts}") == F.col("b.__best_ts")),
        "inner",
    )
    bcols = [F.col(f"b.{c}") for c in left.columns] + [F.col("b.__best_ts")]
    others = [c for c in rnames if c != right_ts]
    if others == [tiebreak]:
        # payload beyond the timestamp IS the tiebreak column: plain max,
        # hash-aggregatable end to end
        agg = F.max(F.col(f"r2.{tiebreak}")).alias("__tb")
        picked = rejoined.groupBy(*bcols).agg(agg)
        out_r = {tiebreak: F.col("__tb"), right_ts: F.col("__best_ts")}
    else:
        # general payload: tie-resolve by max_by over the (small) tied
        # set — SortAggregate again, but over ~|left| rows, not |matches|
        agg = F.max_by(
            F.struct(*[F.col(f"r2.{c}").alias(c) for c in others]),
            F.col(f"r2.{tiebreak}"),
        ).alias("__bestp")
        picked = rejoined.groupBy(*bcols).agg(agg)
        out_r = {c: F.col(f"__bestp.{c}") for c in others}
        out_r[right_ts] = F.col("__best_ts")
    return picked.select(
        *[c for c in left.columns],
        *[out_r[c].alias(c) for c in rnames],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tiebreak: str,
    bucket_seconds: int = 30 * 86400,
) -> DataFrame:
    """As-of join with the time axis bucketed — the large×large scale path.

    The plain formulation (equi-join on the key + range predicate) has a
    join output of |matches| rows before the per-left-row argmax; with
    large per-key match multiplicity that intermediate dominates. Here
    every join is an EQUI join on ``(key, time_bucket)``:

    1. per-(key, bucket) **summary**: the best right row of each bucket
       (one aggregate row per nonempty bucket);
    2. **carry**: for each left bucket, the best right row from any
       strictly-earlier bucket — a running ``last`` over the per-key
       bucket summaries (window over #(key, bucket) rows, not matches);
    3. **in-bucket**: left ⋈ right on (key, bucket) with the exact
       ``right_ts <= left_ts`` filter — multiplicity bounded by bucket
       width, tunable via ``bucket_seconds``;
    4. answer = max(in-bucket candidate, carry candidate) per left row.

    Right rows in earlier buckets need no timestamp filter (bucket order
    implies ``right_ts < left_ts``); later buckets never meet the left
    row. Result is identical to :func:`asof_join` (same ordering struct,
    same inner semantics) — registered under the same oracle and asserted
    equal in tests/test_consistency.py.
    """
    from pyspark.sql import Window

    rnames = [c for c in right.columns if c != on]
    bucket = lambda ts: F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds)  # noqa: E731
    lb = left.withColumn("__b", bucket(left_ts))
    rb = right.withColumn("__b", bucket(right_ts))
    # candidate = (ordering struct, payload struct): max() picks by
    # (right_ts, tiebreak) first — same order as asof_join's max_by.
    cand = F.struct(
        F.struct(
            F.col(right_ts).alias("ts"), F.col(tiebreak).alias("tb")
        ).alias("o"),
        F.struct(*[F.col(c).alias(c) for c in rnames]).alias("p"),
    )

    summaries = rb.groupBy(on, "__b").agg(F.max(cand).alias("s")).withColumn(
        "__src", F.lit(1)
    )
    markers = (
        lb.select(on, "__b")
        .distinct()
        .withColumn("__src", F.lit(0))
        .withColumn("s", F.lit(None).cast(summaries.schema["s"].dataType))
    )
    # markers sort BEFORE same-bucket summaries (__src 0 < 1), so a left
    # bucket's carry sees only strictly-earlier buckets; the latest
    # nonempty bucket's summary is the global best (bucket order is time
    # order for the per-bucket maxima).
    w = (
        Window.partitionBy(on)
        .orderBy("__b", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        markers.unionByName(summaries)
        .withColumn("carry", F.last("s", ignorenulls=True).over(w))
        .filter(F.col("__src") == 0)
        .select(on, "__b", "carry")
    )

    in_bucket = (
        lb.join(
            rb.select(on, "__b", cand.alias("s"), F.col(right_ts).alias("__rts")),
            [on, "__b"],
        )
        .filter(F.col("__rts") <= F.col(left_ts))
        .groupBy(*left.columns)
        .agg(F.max("s").alias("inb"))
    )

    return (
        lb.join(carry, [on, "__b"], "left")
        .join(in_bucket, list(left.columns), "left")
        .withColumn("__best", F.greatest("inb", "carry"))  # greatest skips nulls
        .filter(F.col("__best").isNotNull())
        .select(
            *left.columns, *[F.col(f"__best.p.{c}").alias(c) for c in rnames]
        )
    )


ASOF_ORACLE = """
    SELECT event_id, ts, user_id, o_orderkey, o_orderdate
    FROM (
        SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
"""


@register("join_asof_pandas", ASOF_ORACLE, tags=("join",))
def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped ``applyInPandas`` + ``pd.merge_asof`` — the
    alternative physical strategy for high match multiplicity: both sides
    shuffle ONCE on the equi key, each key group merges sorted in pandas
    (O(n log n) per group) instead of materializing the |matches| join.
    Must agree with the window-based ``join_asof`` (asserted in
    tests/test_consistency.py) and shares its full oracle: the stable-sort
    tie-break below reproduces the oracle's (date DESC, key DESC) pick.

    DO NOT USE past ~10⁵ distinct equi-keys: each key group pays a fixed
    Arrow serialize → Python → pandas → Arrow round-trip, measured as a
    ~32 s FLOOR at sf0.1 (α=0.10 to sf1's 40.6 s — the floor, not the
    data, dominates; see SCALING.json). ``join_asof`` (union + last-value
    window, 1.4 s) and ``join_asof_bucketed`` are the defaults; reach for
    this arm only when per-key match multiplicity is so high that the
    window formulation's shuffle payload explodes — the same candor
    contract as the dedup family's pedagogical arms."""
    import pandas as pd

    events = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("ts")
        # stable-sort so the LAST row per o_orderdate has the max orderkey,
        # matching the window formulation's (date DESC, key DESC) tie-break
        right = right.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
        out = pd.merge_asof(
            left,
            right,
            left_on="ts",
            right_on="o_orderdate",
            direction="backward",
        )
        out = out.dropna(subset=["o_orderkey"])
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        return out[["event_id", "ts", "user_id_x", "o_orderkey", "o_orderdate"]].rename(
            columns={"user_id_x": "user_id"}
        )

    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            merge,
            "event_id bigint, ts timestamp, user_id bigint, "
            "o_orderkey bigint, o_orderdate timestamp",
        )
    )


@register("join_asof", ASOF_ORACLE, tags=("join",))
def join_asof_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each event, the most recent order of that user at event time.
    (DuckDB could use ASOF JOIN; the oracle uses an explicit window so the
    o_orderkey tie-break is pinned on both sides.)"""
    events = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_join(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        tiebreak="o_orderkey",
    )


@register("join_asof_bucketed", ASOF_ORACLE, tags=("join",))
def join_asof_bucketed_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics through the time-bucketed plan (every join an
    equi-join on (key, bucket); see :func:`asof_join_bucketed`) — the
    strategy for large×large inputs with high per-key match multiplicity.
    Shares ``join_asof``'s oracle: the two strategies must be
    indistinguishable by result."""
    events = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_join_bucketed(
        events, orders, on="user_id", left_ts="ts", right_ts="o_orderdate",
        tiebreak="o_orderkey",
    )


_BUCKET_US = 2 * 3600 * 1_000_000  # 2 h in microseconds = window length


@register(
    "join_range_bucketed",
    """
    SELECT a.event_id AS view_id, b.event_id AS purchase_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) // 1000000 AS delta_s
    FROM events a JOIN events b ON a.user_id = b.user_id
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
      AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 2 HOUR
    ORDER BY view_id, purchase_id
    """,
    tags=("join", "range"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large×large interval join (view → purchase within 2 h, same user)
    via TIME BUCKETING: the oracle states the naive theta-join semantics;
    the implementation never runs it. Each window spans ≤ 2 fixed-width
    buckets (bucket width = window length), so the window side explodes to
    its covering buckets, the point side maps to ONE bucket, and the match
    is a plain equi-join on (user, bucket) + exact range refilter — every
    qualifying pair meets in exactly one bucket, so no dedup is needed.

    Scale shape: two hash shuffles on (user_id, bucket) and nothing else —
    the all-pairs-per-user blowup of the naive BroadcastNestedLoopJoin
    never materializes. This is the same banding trick as
    ``join_asof_bucketed``, specialized to interval overlap; at 100 TB
    pick the bucket width ≈ the window length to keep the explode factor
    at 2."""
    e = load(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("a_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("a_um"),
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("b_um"),
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_BUCKET_US)).alias("bucket"),
    )
    a_exploded = a.select(
        "view_id",
        "a_user",
        "a_um",
        F.explode(
            F.sequence(
                F.floor(F.col("a_um") / F.lit(_BUCKET_US)),
                F.floor((F.col("a_um") + F.lit(_BUCKET_US - 1)) / F.lit(_BUCKET_US)),
            )
        ).alias("bucket"),
    )
    return (
        a_exploded.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (a_exploded.bucket == b.bucket)
            & (F.col("b_um") >= F.col("a_um"))
            & (F.col("b_um") < F.col("a_um") + F.lit(_BUCKET_US)),
        )
        .select(
            "view_id",
            "purchase_id",
            F.floor((F.col("b_um") - F.col("a_um")) / F.lit(1_000_000))
            .cast("bigint")
            .alias("delta_s"),
        )
        .orderBy("view_id", "purchase_id")
    )


@register(
    "join_shuffle_hash_hint",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_c100
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("join", "hint"),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join-strategy hint surface: force a ShuffledHashJoin where the
    optimizer would default to sort-merge — the right call when one side
    is much smaller than the other but too big to broadcast (build a hash
    table per partition, skip both sorts). Same answer as the unhinted
    plan by construction; `tests/test_plans.py` asserts the physical
    operator actually switched."""
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("price_c100"),
        )
    )
