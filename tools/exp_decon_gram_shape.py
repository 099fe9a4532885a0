"""Round-16 A/B: 13-gram generation shape for decontamination.

CUR (registered): ``explode(transform(sequence, i -> md5(array_join(
slice(toks,i,13)))))`` — the md5+slice runs INTERPRETED inside the HOF
lambda, once per gram (Catalyst HOFs are CodegenFallback).
GEN (candidate): ``explode(sequence(1, n-12)) AS i`` then a PROJECTED
``md5(array_join(slice(toks, i, 13), ' '))`` — Generate + codegen'd
projection (the r15 gopher-shape fix applied to the decon branch).

Also: the 3-gram ``shingles()`` lambda body — concat_ws(3x element_at)
vs array_join(slice(.,i,3)) — measured on the signature-chain noop.

Results asserted identical before timing. Interleaved, wall + JVM CPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.operators.curation import DECON_N, EVAL_DOCS
from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    shingle_hashes,
    minhash_signature,
)
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="decon-gram-shape", master="local[32]",
                  shuffle_partitions=32)


def d():
    return spread(load(spark, SF, "documents"))


def g_cur():
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (DECON_N - 1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i, DECON_N), " ")),
    )
    return d().filter(F.size(toks) >= DECON_N).select(
        "doc_id", F.explode(grams).alias("g")
    )


def g_gen():
    toks = F.split(F.col("text"), " ")
    return (
        d()
        .filter(F.size(toks) >= DECON_N)
        .select(
            "doc_id",
            F.split(F.col("text"), " ").alias("toks"),
            F.explode(
                F.sequence(F.lit(1), F.size(toks) - (DECON_N - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(
                F.array_join(F.slice("toks", F.col("i"), DECON_N), " ")
            ).alias("g"),
        )
    )


def full(g):
    ev = g.filter(F.col("doc_id") < EVAL_DOCS).select("g").distinct()
    return (
        g.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_contaminated"))
    )


def shingles_v(text, body):
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    if body == "concat":
        lam = lambda i: F.concat_ws(  # noqa: E731
            " ", F.element_at(toks, i), F.element_at(toks, i + 1),
            F.element_at(toks, i + 2)
        )
    else:
        lam = lambda i: F.array_join(F.slice(toks, i, 3), " ")  # noqa: E731
    return F.when(
        F.size(toks) >= 3, F.array_distinct(F.transform(idx, lam))
    ).otherwise(F.array().cast("array<string>"))


def sigchain(body):
    return (
        d()
        .select("doc_id", shingles_v(F.col("text"), body).alias("sh"))
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
    )


def timeit(tag, mk):
    spark.catalog.clearCache()
    t0, c0 = time.perf_counter(), jvm_cpu()
    mk().write.format("noop").mode("overwrite").save()
    w, c = time.perf_counter() - t0, jvm_cpu() - c0
    print(f"{tag:14s} wall {w:7.3f}  cpu {c:7.2f}", flush=True)
    return w, c


a = full(g_cur()).orderBy("doc_id").collect()
b = full(g_gen()).orderBy("doc_id").collect()
assert a == b, "decon variants differ!"
x = sigchain("concat").orderBy("doc_id").select("doc_id", "sh", "sig").collect()
y = sigchain("slice").orderBy("doc_id").select("doc_id", "sh", "sig").collect()
assert x == y, "shingle variants differ!"
print("identity OK", len(a), "decon rows,", len(x), "sig rows", flush=True)

res = {}
for rnd in range(ROUNDS):
    for tag, mk in (
        ("decon_cur", lambda: full(g_cur())),
        ("decon_gen", lambda: full(g_gen())),
        ("sig_concat", lambda: sigchain("concat")),
        ("sig_slice", lambda: sigchain("slice")),
    ):
        res.setdefault(tag, []).append(timeit(tag, mk))

for tag, vals in res.items():
    print(f"== {tag:14s} MIN wall {min(w for w,_ in vals):7.3f} "
          f"cpu {min(c for _,c in vals):7.2f}")
