"""Pack-efficiency delta: estimator packing vs frozen-BPE packing
(VERDICT r14 #4's payoff measurement).

``curation_pack_sequences`` bins by the whitespace-token estimator;
``curation_pack_bpe`` bins by real frozen-tokenizer BPE counts. The
practical question: if you pack by the ESTIMATOR but the model consumes
BPE tokens, how badly do the packed context windows miss the budget?

For each arm this prints, per bin: the REAL BPE token mass that the
arm's (shard, bin) assignment puts into a 2048-token window, and from
it the overflow rate (bins whose real mass exceeds the budget — truncation
at training time) and mean fill. Run at sf0.01 by default:

    python tools/exp_pack_bpe_delta.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.operators.curation import (
        PACK_BUDGET,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="pack-bpe-delta", master="local[16]", shuffle_partitions=16
    )
    qs = load_all_operators()
    est = qs["curation_pack_sequences"].fn(spark, sf).alias("est")
    bpe = qs["curation_pack_bpe"].fn(spark, sf).alias("bpe")
    real_counts = bpe.select("doc_id", F.col("n_tokens").alias("real_n"))

    out: dict[str, dict] = {"sf_dir": sf, "budget": PACK_BUDGET}
    for name, arm in (("estimator", est), ("bpe", bpe)):
        bins = (
            arm.join(real_counts, "doc_id")
            .groupBy("shard", "bin")
            .agg(
                F.sum("real_n").alias("real_mass"),
                F.count(F.lit(1)).alias("n_docs"),
            )
        )
        row = bins.agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.avg("real_mass").alias("mean_real_mass"),
            F.avg(
                (F.col("real_mass") > F.lit(PACK_BUDGET)).cast("double")
            ).alias("overflow_rate"),
            F.avg(
                F.least(F.col("real_mass") / F.lit(PACK_BUDGET), F.lit(1.0))
            ).alias("mean_fill"),
        ).first()
        out[name] = {
            "n_bins": int(row["n_bins"]),
            "mean_real_mass": round(float(row["mean_real_mass"]), 1),
            "overflow_rate": round(float(row["overflow_rate"]), 4),
            "mean_fill": round(float(row["mean_fill"]), 4),
        }
    # the word→BPE undercount that drives the estimator's overflow
    docs = est.select("doc_id", F.col("n_tokens").alias("est_n")).join(
        real_counts, "doc_id"
    )
    r = docs.agg(
        F.avg(F.col("real_n") / F.col("est_n")).alias("bpe_per_word")
    ).first()
    out["mean_bpe_per_estimator_token"] = round(float(r["bpe_per_word"]), 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
