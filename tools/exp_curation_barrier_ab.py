"""A/B: `pipeline_flag_frame`'s MinHash-signature barrier — `repartition`
Exchange (pre-r15) vs `persist()` (the `_lsh_verified_pairs` caller
contract, applied to the three dedup.py callers in r8 with a measured
~25% win; the curation composition predates that fix and kept the
Exchange).

Why the Exchange loses here: the barriered `(doc_id, sh, sig)` frame has
consumers needing DIFFERENT columns (band side: `sig`; verify sides:
`sh`), so per-branch column pruning splits the Exchange into per-consumer
subtrees and the shingle+signature transform computes ~2x (SCALE.md
round-8 section). An InMemoryRelation cannot be split.

Protocol: both variants built inline, INTERLEAVED in one session,
min-of-N wall + JVM CPU seconds; final 1-row stats asserted identical.

Usage: python tools/exp_curation_barrier_ab.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from exp_bpe_base_ckpt import jvm_cpu_seconds  # noqa: E402


def _flag_stats(spark, sf_dir: str, barrier: str):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.operators.curation import (
        EVAL_DOCS,
        DECON_N,
        QUAL_MIN_TOK,
        QUAL_REP_X50,
    )
    from wod_ascii_to_parquet_spark_spark.operators.dedup import (
        _lsh_verified_pairs,
        minhash_signature,
        shingle_hashes_md5,
        shingles,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load, spread

    d = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    grams3 = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = d.select(
        "doc_id",
        "text",
        F.size(toks).alias("ntok"),
        F.size(grams3).alias("n3"),
        F.size(F.array_distinct(grams3)).alias("d3"),
    )
    qf = (F.col("ntok") < QUAL_MIN_TOK) | (
        (F.col("n3") - F.col("d3")) * QUAL_REP_X50 > F.col("n3")
    )
    w_exact = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")

    s = (
        d.select("doc_id", shingles(F.col("text")).alias("sh"))
        .withColumn("hashes", shingle_hashes_md5(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
    )
    s = s.persist() if barrier == "persist" else s.repartition(F.col("doc_id"))
    near = (
        _lsh_verified_pairs(s)
        .select(F.col("doc_b").alias("nd_id"))
        .distinct()
    )

    t = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (DECON_N - 1)),
        lambda i: F.md5(F.array_join(F.slice(t, i, DECON_N), " ")),
    )
    g = d.filter(F.size(t) >= DECON_N).select(
        "doc_id", F.explode(grams).alias("g")
    )
    ev = g.filter(F.col("doc_id") < EVAL_DOCS).select("g").distinct()
    contam = (
        g.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(ev), "g")
        .select(F.col("doc_id").alias("cd_id"))
        .distinct()
    )

    f = (
        base.withColumn("qf", qf.cast("int"))
        .withColumn("ed", (F.row_number().over(w_exact) > 1).cast("int"))
        .join(F.broadcast(near), F.col("doc_id") == F.col("nd_id"), "left")
        .withColumn("nd", F.col("nd_id").isNotNull().cast("int"))
        .drop("nd_id")
        .join(F.broadcast(contam), F.col("doc_id") == F.col("cd_id"), "left")
        .withColumn("cd", F.col("cd_id").isNotNull().cast("int"))
        .drop("cd_id")
    )
    kept = (
        (F.col("doc_id") >= EVAL_DOCS)
        & (F.col("qf") == 0)
        & (F.col("ed") == 0)
        & (F.col("nd") == 0)
        & (F.col("cd") == 0)
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("qf").alias("n_quality_fail"),
        F.sum("ed").alias("n_exact_dup"),
        F.sum("nd").alias("n_near_dup"),
        F.sum("cd").alias("n_contaminated"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("ntok")).otherwise(0)).alias("tok_kept"),
    )


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="exp-curation-barrier", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    ref = _flag_stats(spark, sf, "repartition").collect()
    assert _flag_stats(spark, sf, "persist").collect() == ref, "results differ!"
    spark.catalog.clearCache()

    wall: dict[str, list[float]] = {"repartition": [], "persist": []}
    cpu: dict[str, list[float]] = {"repartition": [], "persist": []}
    for _ in range(n_rounds):
        for variant in ("repartition", "persist"):
            spark.catalog.clearCache()
            t0w, t0c = time.perf_counter(), jvm_cpu_seconds()
            _flag_stats(spark, sf, variant).write.format("noop").mode(
                "overwrite"
            ).save()
            wall[variant].append(round(time.perf_counter() - t0w, 3))
            cpu[variant].append(round(jvm_cpu_seconds() - t0c, 3))
    print(
        json.dumps(
            {
                "wall_min": {k: min(v) for k, v in wall.items()},
                "cpu_min": {k: min(v) for k, v in cpu.items()},
                "wall": wall,
                "cpu": cpu,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
