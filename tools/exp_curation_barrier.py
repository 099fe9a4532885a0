"""Honest A/B of the LSH barrier INSIDE pipeline_flag_frame (used by
curation_pipeline_stats / curate_corpus): repartition (current) vs
persist, sf0.1 + sf1."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators, load, spread

spark = get_spark(app_name="curbar", master="local[32]", shuffle_partitions=32)
load_all_operators()

import wod_ascii_to_parquet_spark_spark.operators.curation as CUR
from wod_ascii_to_parquet_spark_spark.operators.curation import (
    EVAL_DOCS,
    pipeline_flag_frame,
)

orig = pipeline_flag_frame


def stats(sf_dir: str):
    d = spread(load(spark, sf_dir, "documents"))
    f = CUR.pipeline_flag_frame(d)
    kept = (
        (F.col("doc_id") >= EVAL_DOCS)
        & (F.col("qf") == 0) & (F.col("ed") == 0)
        & (F.col("nd") == 0) & (F.col("cd") == 0)
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


import re, types

src = CUR.__dict__
# Build a persist variant by monkeypatching: wrap pipeline_flag_frame's
# internal barrier is inline, so instead patch DataFrame.repartition for
# the (doc_id,sh,sig) frame? Too invasive — simpler: copy the function
# source with the barrier swapped at runtime via exec.
import inspect

code = inspect.getsource(CUR.pipeline_flag_frame)
code_persist = code.replace(
    '.repartition(F.col("doc_id"))  # shuffle barrier (see dedup.py)',
    ".persist()  # materialization barrier (A/B experiment)",
)
assert code_persist != code, "barrier line not found"
ns = dict(CUR.__dict__)
exec(code_persist, ns)
flag_persist = ns["pipeline_flag_frame"]

for sf in ["/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1"]:
    for label, fn in [("repartition", orig), ("persist", flag_persist)]:
        CUR.pipeline_flag_frame = fn
        runs = []
        for _ in range(4):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            stats(sf).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        print({"sf": sf.rsplit("/",1)[-1], "barrier": label,
               "runs": [round(r,2) for r in runs], "min": round(min(runs),3)},
              flush=True)
CUR.pipeline_flag_frame = orig
