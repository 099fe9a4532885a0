"""Interleaved A/B of curation_gopher_repetition's two full-query shapes
(round 15): OLD = one-pass nested-HOF explode (9 transform arrays of
structs, flatten, one explode); NEW = 9-branch union with
explode(sequence) + slice/array_join (the shape now registered).
Results asserted identical; wall + JVM CPU per run, variants interleaved
pairwise in every round.
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.operators.curation import (
    _GOPHER_DUP_NS,
    _GOPHER_TOP_NS,
)
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NS = _GOPHER_TOP_NS + _GOPHER_DUP_NS

spark = get_spark(app_name="gopher-full-ab", master="local[32]", shuffle_partitions=32)


def base():
    return spread(load(spark, SF, "documents")).select(
        "doc_id", "text", F.length("text").cast("double").alias("chars")
    )


def ex_old():
    d = base()
    toks = F.split(F.col("text"), " ")

    def grams(n: int):
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        g = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
        return F.when(F.size(toks) >= n, g).otherwise(
            F.array().cast("array<string>")
        )

    def tagged(n: int):
        return F.transform(
            grams(n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    pairs = F.flatten(F.array(*[tagged(n) for n in NS]))
    return d.select("doc_id", "chars", F.explode(pairs).alias("p")).select(
        "doc_id", "chars", F.col("p.n").alias("n"), F.col("p.gram").alias("gram")
    )


def ex_new():
    dt = base().select(
        "doc_id", "chars", F.split(F.col("text"), " ").alias("toks")
    )

    def gram_rows(n: int) -> DataFrame:
        return (
            dt.filter(F.size("toks") >= n)
            .select(
                "doc_id", "chars", F.lit(n).alias("n"), "toks",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1))
                ).alias("i"),
            )
            .select(
                "doc_id", "chars", "n",
                F.array_join(F.slice("toks", F.col("i"), n), " ").alias("gram"),
            )
        )

    return reduce(DataFrame.unionAll, [gram_rows(n) for n in NS])


def full(ex):
    d = base()
    counts = ex.groupBy("doc_id", "chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("doc_id", "n").orderBy(F.desc("c"), F.asc("gram"))
    top1 = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id", "n",
            (F.col("c") * F.length("gram")).cast("double").alias("top_chars"),
        )
    )
    dups = counts.groupBy("doc_id", "n").agg(
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, (F.col("c") - 1) * F.length("gram"))),
            F.lit(0),
        ).cast("double").alias("dup_chars")
    )
    agg = top1.join(dups, ["doc_id", "n"])
    frac = lambda num: F.round(  # noqa: E731
        F.coalesce(F.max(num) / F.first("chars"), F.lit(0.0)), 6
    )
    return (
        d.select("doc_id", "chars")
        .join(agg, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            *[frac(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"top{n}_char_frac") for n in _GOPHER_TOP_NS],
            *[frac(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"dup{n}_char_frac") for n in _GOPHER_DUP_NS],
        )
    )


from _bench_util import jvm_cpu  # noqa: E402


a = full(ex_old()).orderBy("doc_id").collect()
b = full(ex_new()).orderBy("doc_id").collect()
assert a == b, "results differ!"
print("identity OK over", len(a), "rows", flush=True)

res = {"old": [], "new": []}
for rnd in range(5):
    for name, mk in (("old", ex_old), ("new", ex_new)):
        spark.catalog.clearCache()
        t0, c0 = time.perf_counter(), jvm_cpu()
        full(mk()).write.format("noop").mode("overwrite").save()
        w_, c_ = time.perf_counter() - t0, jvm_cpu() - c0
        res[name].append((round(w_, 3), round(c_, 2)))
        print(f"round {rnd} {name:3s} wall {w_:7.3f}  cpu {c_:7.2f}", flush=True)

print("MIN wall old", min(w for w, _ in res["old"]), "new", min(w for w, _ in res["new"]))
print("MIN cpu  old", min(c for _, c in res["old"]), "new", min(c for _, c in res["new"]))


# ---- fused variant: top1-argmax + dups in ONE aggregation ----
def full_fused(ex):
    d = base()
    counts = ex.groupBy("doc_id", "chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_n = counts.groupBy("doc_id", "n").agg(
        # min(struct(-c, gram)) == the row row_number picks under
        # ORDER BY c DESC, gram ASC (lexicographic struct comparison)
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("gram").alias("gram"))).alias("t"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, (F.col("c") - 1) * F.length("gram"))),
            F.lit(0),
        ).cast("double").alias("dup_chars"),
    )
    agg = per_n.select(
        "doc_id", "n",
        ((-F.col("t.nc")) * F.length("t.gram")).cast("double").alias("top_chars"),
        "dup_chars",
    )
    frac = lambda num: F.round(  # noqa: E731
        F.coalesce(F.max(num) / F.first("chars"), F.lit(0.0)), 6
    )
    return (
        d.select("doc_id", "chars")
        .join(agg, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            *[frac(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"top{n}_char_frac") for n in _GOPHER_TOP_NS],
            *[frac(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"dup{n}_char_frac") for n in _GOPHER_DUP_NS],
        )
    )


c = full_fused(ex_new()).orderBy("doc_id").collect()
assert a == c, "fused differs!"
print("fused identity OK", flush=True)

res2 = {"new": [], "fused": []}
for rnd in range(5):
    for name, mk in (("new", lambda: full(ex_new())), ("fused", lambda: full_fused(ex_new()))):
        spark.catalog.clearCache()
        t0, c0 = time.perf_counter(), jvm_cpu()
        mk().write.format("noop").mode("overwrite").save()
        w_, c_ = time.perf_counter() - t0, jvm_cpu() - c0
        res2[name].append((round(w_, 3), round(c_, 2)))
        print(f"round {rnd} {name:5s} wall {w_:7.3f}  cpu {c_:7.2f}", flush=True)

for k in res2:
    print(k, "min wall", min(w for w, _ in res2[k]), "min cpu", min(c for _, c in res2[k]))


# ---- two-generator single-pass variant: explode n, then explode i ----
def ex_gen2():
    dt = base().select(
        "doc_id", "chars", F.split(F.col("text"), " ").alias("toks")
    )
    return (
        dt.select(
            "doc_id", "chars", "toks",
            F.explode(F.array(*[F.lit(n) for n in NS])).alias("n"),
        )
        .filter(F.size("toks") >= F.col("n"))
        .select(
            "doc_id", "chars", "n", "toks",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - F.col("n") + 1)
            ).alias("i"),
        )
        .select(
            "doc_id", "chars", "n",
            F.array_join(F.slice("toks", F.col("i"), F.col("n")), " ").alias("gram"),
        )
    )


g = full(ex_gen2()).orderBy("doc_id").collect()
assert a == g, "gen2 differs!"
print("gen2 identity OK", flush=True)

res3 = {"union": [], "gen2": []}
for rnd in range(5):
    for name, mk in (("union", lambda: full(ex_new())), ("gen2", lambda: full(ex_gen2()))):
        spark.catalog.clearCache()
        t0, c0 = time.perf_counter(), jvm_cpu()
        mk().write.format("noop").mode("overwrite").save()
        w_, c_ = time.perf_counter() - t0, jvm_cpu() - c0
        res3[name].append((round(w_, 3), round(c_, 2)))
        print(f"round {rnd} {name:5s} wall {w_:7.3f}  cpu {c_:7.2f}", flush=True)

for k in res3:
    print(k, "min wall", min(w for w, _ in res3[k]), "min cpu", min(c for _, c in res3[k]))

df = full(ex_gen2())
df.write.format("noop").mode("overwrite").save()
plan = df._jdf.queryExecution().executedPlan().toString()
import re
print("gen2 runtime: Exchanges", len(re.findall(r"\bExchange\b", plan)),
      "scans", len(re.findall(r"Scan parquet", plan)))
