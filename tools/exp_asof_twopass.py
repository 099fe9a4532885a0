"""Round-16 A/B for join_asof: SortAggregate max_by(struct) vs a
two-pass HashAggregate formulation.

CUR: join -> groupBy(left).agg(max_by(payload_struct, (ts, tb))) —
     max_by's struct buffer is not UnsafeRow-mutable, so Spark plans
     SortAggregate: a partial sort over the |matches| join output and a
     final sort over |left| rows.
NEW: (1) join -> groupBy(left).agg(max(right_ts)) — HashAggregate
     (timestamp buffer is mutable), partial map-side;
     (2) re-join right on (key, right_ts == best_ts), then
     groupBy(left).agg(max(tb)) + the payload via a second max_by over
     the (now tiny) tied set... here payload == (o_orderkey=tb,
     o_orderdate=best_ts) exactly, so step 2 is just max(o_orderkey) —
     HashAggregate as well. Fully general in the (ts, tiebreak) ordering,
     no day-granularity assumption.

Results asserted identical; wall + JVM CPU, interleaved.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.registry import load, load_all_operators
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="asof-twopass", master="local[32]",
                  shuffle_partitions=32)
qs = load_all_operators()


def cur():
    return qs["join_asof"].fn(spark, SF)


def twopass():
    events = load(spark, SF, "events").select("event_id", "ts", "user_id")
    orders = load(spark, SF, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    j = events.join(
        orders,
        (events["user_id"] == orders["user_id"])
        & (F.col("o_orderdate") <= F.col("ts")),
        "inner",
    ).select(
        "event_id", "ts", events["user_id"].alias("user_id"),
        "o_orderkey", "o_orderdate",
    )
    best_ts = j.groupBy("event_id", "ts", "user_id").agg(
        F.max("o_orderdate").alias("o_orderdate")
    )
    o2 = load(spark, SF, "orders").select(
        F.col("o_custkey").alias("u2"),
        F.col("o_orderkey").alias("k2"),
        F.col("o_orderdate").alias("d2"),
    )
    out = best_ts.join(
        o2,
        (F.col("user_id") == F.col("u2"))
        & (F.col("o_orderdate") == F.col("d2")),
        "inner",
    )
    return (
        out.groupBy("event_id", "ts", "user_id", "o_orderdate")
        .agg(F.max("k2").alias("o_orderkey"))
        .select("event_id", "ts", "user_id", "o_orderkey", "o_orderdate")
    )


def timeit(tag, mk):
    spark.catalog.clearCache()
    t0, c0 = time.perf_counter(), jvm_cpu()
    mk().write.format("noop").mode("overwrite").save()
    w, c = time.perf_counter() - t0, jvm_cpu() - c0
    print(f"{tag:10s} wall {w:7.3f}  cpu {c:7.2f}", flush=True)
    return w, c


a = sorted(map(tuple, cur().collect()))
b = sorted(map(tuple, twopass().collect()))
assert a == b, (len(a), len(b), a[:2], b[:2])
print("identity OK,", len(a), "rows", flush=True)

res = {}
for rnd in range(ROUNDS):
    for tag, mk in (("cur", cur), ("twopass", twopass)):
        res.setdefault(tag, []).append(timeit(tag, mk))

for tag, vals in res.items():
    print(f"== {tag:10s} MIN wall {min(w for w, _ in vals):7.3f} "
          f"cpu {min(c for _, c in vals):7.2f}")
