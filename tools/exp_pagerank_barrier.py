"""Honest (cache-cleared) one-shot cost of graph_pagerank's static-graph
barrier variants: persist (current) vs repartition-only vs none, at sf0.1
and sf1. Also splits build (count action) vs iterate (final noop job)."""

from __future__ import annotations

import math
import time

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.session import get_spark
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators, load

spark = get_spark(app_name="prbar", master="local[32]", shuffle_partitions=32)
load_all_operators()

from wod_ascii_to_parquet_spark_spark.operators import graph as G

_SCALE, _TELEPORT, _DAMP = G._SCALE, G._TELEPORT, G._DAMP


def pagerank(sf_dir: str, barrier: str):
    pairs = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select((F.col("l_suppkey") * 2).alias("s"), (F.col("o_custkey") * 2 + 1).alias("c"))
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src")
    if barrier == "persist":
        ew = ew.repartition("src").persist()
    elif barrier == "repartition":
        ew = ew.repartition("src")
    nodes = ew.select(F.col("src").alias("id")).distinct()
    n_val = nodes.count()
    base = math.floor(_SCALE / n_val)
    teleport = math.floor(_TELEPORT / n_val)
    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            ew.join(ranks, F.col("src") == F.col("id"))
            .groupBy("dst")
            .agg(F.sum(F.floor(F.col("r").cast("double") / F.col("outdeg"))).alias("m"))
        )
        ranks = contrib.select(
            F.col("dst").alias("id"),
            (F.lit(teleport) + F.floor(F.lit(_DAMP) * F.col("m"))).cast("bigint").alias("r"),
        )
    return ranks.select("id", F.col("r").alias("rank_fp")).orderBy(F.desc("rank_fp"), "id").limit(50)


for sf in ["/root/testdata/sf0.1", "/root/repo/spark-warehouse/sf1"]:
    for barrier in ["persist", "repartition", "none"]:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = pagerank(sf, barrier)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_iter = time.perf_counter() - t0
            runs.append((t_build, t_iter))
        best = min(runs, key=lambda r: r[0] + r[1])
        print({"sf": sf.rsplit("/",1)[-1], "barrier": barrier,
               "build_sec": round(best[0], 3), "iterate_sec": round(best[1], 3),
               "total": round(best[0] + best[1], 3)}, flush=True)
