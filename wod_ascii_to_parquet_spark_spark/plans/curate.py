"""End-to-end corpus curation JOB: the registered curation operators
composed into one materializing pipeline —

    documents → quality gate → exact dedup → MinHash near-dedup →
    13-gram decontamination → shard + context-window packing →
    partitioned parquet write + _STATS.json sidecar

The per-stage semantics are exactly `operators/curation.py::
pipeline_flag_frame` (whose 1-row reduction, `curation_pipeline_stats`,
is fully DuckDB-oracled — so the job's logic is cross-engine verified
even though the job itself writes files). `tests/test_curate_e2e.py`
pins the written corpus to the oracled stats.

Scale notes (100 TB):
- Per-stage stats are collected IN-FLIGHT with the Observation API
  (``df.observe``): the metrics accumulate on the executors while the
  write's one pass streams by, so the audit costs zero extra scans and
  the flag frame needs no persist/cache at any scale — at 100 TB that
  is the difference between one pass and two (or a corpus-sized cache).
- The write shuffles once on shard (hash) and sorts within partitions by
  (bin, doc_id) so each shard file is in training order; shard count is
  the downstream loader parallelism.
- Packing is per-shard running sums — one window per shard, no global
  sort (same plan as `curation_pack_sequences`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.curation import EVAL_DOCS, pipeline_flag_frame
from ..registry import load, spread

PACK_BUDGET = 2048
N_SHARDS = 8

STATS_FILE = "_STATS.json"


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    pack_budget: int = PACK_BUDGET,
    n_shards: int = N_SHARDS,
) -> dict:
    """Run the full curation pipeline and write the packed training corpus
    to ``out_dir`` (parquet, partitioned by ``shard``, rows sorted by
    ``(bin, doc_id)``). Returns the per-stage stats dict and writes it as
    ``_STATS.json`` beside ``_SUCCESS`` (stats last = completion marker
    for the pair, same convention as the conversion pipeline's sidecar).
    """
    from pyspark.sql import Observation

    flags = pipeline_flag_frame(spread(load(spark, sf_dir, "documents")))
    kept_cond = (
        (F.col("doc_id") >= EVAL_DOCS)
        & (F.col("qf") == 0)
        & (F.col("ed") == 0)
        & (F.col("nd") == 0)
        & (F.col("cd") == 0)
    )
    # In-flight audit: observe() rides the write's single pass over the
    # flag frame — no second aggregate job, no persist.
    obs = Observation("curate_stats")
    flags = flags.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum("qf").alias("n_quality_fail"),
        F.sum("ed").alias("n_exact_dup"),
        F.sum("nd").alias("n_near_dup"),
        F.sum("cd").alias("n_contaminated"),
        F.sum(F.when(kept_cond, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept_cond, F.col("ntok")).otherwise(0)).alias("tok_kept"),
    )
    kept = flags.filter(kept_cond).select(
        "doc_id", "text", "lang", "source", "ntok"
    )
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards))
    w = W.partitionBy("shard").orderBy("doc_id")
    packed = (
        kept.withColumn("shard", shard.cast("int"))
        .withColumn(
            "bin",
            F.floor(
                (F.sum("ntok").over(w) - F.col("ntok")) / F.lit(pack_budget)
            ).cast("int"),
        )
    )
    (
        packed.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "bin", "doc_id")
        .write.mode("overwrite")
        # static overwrite: the job owns the directory, and the dynamic
        # committer skips the _SUCCESS marker (see plans/convert.py).
        .option("partitionOverwriteMode", "static")
        .partitionBy("shard")
        .parquet(out_dir)
    )

    # The write above is the action that populated the observation.
    stats = {k: int(v) for k, v in obs.get.items()}
    stats["n_shards"] = n_shards
    stats["pack_budget"] = pack_budget
    with open(os.path.join(out_dir, STATS_FILE), "w") as fh:
        json.dump(stats, fh, sort_keys=True)
    return stats
