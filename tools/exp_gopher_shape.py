"""Phase profile + alternative explode shapes for
curation_gopher_repetition (round 15, census outlier: 20.7 s at sf0.1).

Phases timed with the noop sink:
  P1  explode only (current nested-HOF shape: 9 tagged transform arrays,
      flatten, one explode)
  P2  counts agg
  P3  full query
Alternatives (results asserted identical to the current explode):
  ALT-A  9-way union, per n: posexplode(sequence) + slice/array_join
  ALT-B  9-way union, per n: transform + explode (no struct/flatten)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.operators.curation import (
    _GOPHER_DUP_NS,
    _GOPHER_TOP_NS,
)
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = "/root/testdata/sf0.1"
NS = _GOPHER_TOP_NS + _GOPHER_DUP_NS

spark = get_spark(app_name="gopher-ab", master="local[32]", shuffle_partitions=32)


def base():
    return spread(load(spark, SF, "documents")).select(
        "doc_id", "text", F.length("text").cast("double").alias("chars")
    )


def ex_current():
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


def ex_alt_a():
    d = base().select(
        "doc_id", "chars", F.split(F.col("text"), " ").alias("toks")
    )
    parts = []
    for n in NS:
        p = (
            d.filter(F.size("toks") >= n)
            .select(
                "doc_id",
                "chars",
                F.lit(n).alias("n"),
                F.col("toks"),
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1))
                ).alias("i"),
            )
            .select(
                "doc_id",
                "chars",
                "n",
                F.array_join(F.slice("toks", F.col("i"), n), " ").alias("gram"),
            )
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def ex_alt_b():
    d = base().select(
        "doc_id", "chars", F.split(F.col("text"), " ").alias("toks")
    )
    parts = []
    def gram_arr(n: int):
        toks = F.col("toks")
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )

    for n in NS:
        toks = F.col("toks")
        g = gram_arr(n)
        p = (
            d.filter(F.size(toks) >= n)
            .select(
                "doc_id", "chars", F.lit(n).alias("n"),
                F.explode(g).alias("gram"),
            )
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


from _bench_util import jvm_cpu  # noqa: E402


def timeit(name, df):
    t0, c0 = time.perf_counter(), jvm_cpu()
    df.write.format("noop").mode("overwrite").save()
    print(
        f"{name:12s} wall {time.perf_counter() - t0:7.3f}"
        f"  cpu {jvm_cpu() - c0:7.3f}",
        flush=True,
    )


# identity check on the explode output (sorted counts)
cur = ex_current().groupBy("n").agg(F.count("*").alias("c"), F.sum(F.hash("doc_id", "gram").cast("bigint")).alias("h")).orderBy("n").collect()
aa = ex_alt_a().groupBy("n").agg(F.count("*").alias("c"), F.sum(F.hash("doc_id", "gram").cast("bigint")).alias("h")).orderBy("n").collect()
bb = ex_alt_b().groupBy("n").agg(F.count("*").alias("c"), F.sum(F.hash("doc_id", "gram").cast("bigint")).alias("h")).orderBy("n").collect()
assert cur == aa, f"ALT-A differs: {cur} vs {aa}"
assert cur == bb, f"ALT-B differs: {cur} vs {bb}"
print("identity OK:", [(r["n"], r["c"]) for r in cur], flush=True)

for rnd in range(3):
    timeit(f"r{rnd} current", ex_current())
    timeit(f"r{rnd} alt_a", ex_alt_a())
    timeit(f"r{rnd} alt_b", ex_alt_b())


# ---- full-query phases with each explode shape ----
from pyspark.sql import Window as W


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
    frac = lambda num: F.round(F.coalesce(F.max(num) / F.first("chars"), F.lit(0.0)), 6)
    wide = (
        d.select("doc_id", "chars")
        .join(agg, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            *[frac(F.when(F.col("n") == n, F.col("top_chars"))).alias(f"top{n}_char_frac") for n in _GOPHER_TOP_NS],
            *[frac(F.when(F.col("n") == n, F.col("dup_chars"))).alias(f"dup{n}_char_frac") for n in _GOPHER_DUP_NS],
        )
    )
    return wide


def counts_only(ex):
    return ex.groupBy("doc_id", "chars", "n", "gram").agg(F.count(F.lit(1)).alias("c"))


print("--- full query / phases ---", flush=True)
r1 = full(ex_current()).orderBy("doc_id").collect()
r2 = full(ex_alt_a()).orderBy("doc_id").collect()
assert r1 == r2, "full-query results differ!"
print("full identity OK over", len(r1), "rows", flush=True)

for rnd in range(3):
    timeit(f"r{rnd} counts cur", counts_only(ex_current()))
    timeit(f"r{rnd} counts alt", counts_only(ex_alt_a()))
    timeit(f"r{rnd} full cur", full(ex_current()))
    timeit(f"r{rnd} full alt", full(ex_alt_a()))
