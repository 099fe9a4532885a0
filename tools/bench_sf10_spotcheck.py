"""sf10 spot-check of the alpha >= 1.0 arms (VERDICT r8 #3): one decade
further than the sf0.1->sf1 sweep, on the synthesized sf10 (100x sf0.1;
see tools/make_sf.py). The N^1.5 story predicts the semdedup/ANN family
exponents HOLD as the corpus grows 10x again (the sqrt(N) cell count is
recomputed in-plan); this run measures sf1->sf10 exponents and verifies
predicted pair volumes by exact count. Results land in
SCALING.json['sf10_spotcheck'].

Usage: python tools/bench_sf10_spotcheck.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, "spark-warehouse", "sf1")
SF10 = os.path.join(REPO, "spark-warehouse", "sf10")
RATIO = 10.0
RUNS = 3

DEFAULT = [
    "dedup_embedding_ann",
    "dedup_simhash_md5",
    "dedup_semdedup_prune",
    "dedup_simhash",
]


def _time_query(spark, fn, sf_dir: str) -> float:
    times = []
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return round(min(times[1:]), 3)


def main() -> None:
    from bench import CPUS
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="bench-sf10",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    queries = load_all_operators()
    names = [n for n in (sys.argv[1:] or DEFAULT) if n in queries]

    queries["flagship_regional_revenue"].fn(spark, SF1).write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        fn = queries[name].fn
        t1 = _time_query(spark, fn, SF1)
        t10 = _time_query(spark, fn, SF10)
        alpha = round(
            math.log(max(t10, 1e-3) / max(t1, 1e-3)) / math.log(RATIO), 3
        )
        out[name] = {"sf1_sec": t1, "sf10_sec": t10, "exponent": alpha}
        print(f"{name}: {t1}s -> {t10}s  alpha={alpha}", flush=True)

    # pair-volume verification for the sqrt(N)-cell family: with N rows in
    # ceil(sqrt(N)) balanced cells, within-cell pair volume ~ N^1.5 / 2.
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.operators.similarity import (
        _ivf_assign,
        _seed_array,
        _sqrt_n_seeds,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load

    vols = {}
    for sf_name, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        # one parquet file => 1-2 input splits; the sqrt(N)-cell argmax
        # fold is the expensive part, so spread it across every core
        # (same fix as tools/bench_ann_recall.py — without it the sf10
        # pass runs the 448-cell fold on one core for ~an hour)
        e = (
            load(spark, sf_dir, "embeddings")
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("emb"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
        )
        n = e.count()
        assign = _ivf_assign(e, _seed_array(_sqrt_n_seeds(e)))
        vol = (
            assign.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
            .first()["pairs"]
        )
        vols[sf_name] = {
            "rows": n,
            "within_cell_pairs": int(vol),
            "n_pow_1_5_over_2": int(n**1.5 / 2),
            "ratio_vs_prediction": round(vol / (n**1.5 / 2), 3),
        }
        print(sf_name, vols[sf_name], flush=True)

    path = os.path.join(REPO, "SCALING.json")
    try:
        rec = json.load(open(path))
    except FileNotFoundError:
        rec = {}
    spot = rec.setdefault("sf10_spotcheck", {})
    spot.update(
        {
            "sf_big": SF10,
            "row_ratio": RATIO,
            "method": f"min of {RUNS - 1} measured after 1 warm; clearCache between runs",
            "queries": {**spot.get("queries", {}), **out},
            "sqrt_n_cell_pair_volumes": vols,
        }
    )
    json.dump(rec, open(path, "w"), indent=1)
    print(json.dumps({"spotcheck": out}), flush=True)


if __name__ == "__main__":
    main()
