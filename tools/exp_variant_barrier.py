"""A/B: the `json_variant_extract` parse-once barrier — `repartition`
Exchange (current) vs `persist()` (round-15 question: the minhash/LSH
barrier moved to persist() in r8 with a ~25% win because per-branch
pruning split its Exchange; here ALL six consumers live in ONE projection,
so the Exchange is never split — does the shuffle of the VARIANT binary
still cost more than a cache write+read?).

Both variants compute the identical result (barrier only affects the
physical plan); parity stays pinned by the registered query's oracle.

Usage: python tools/exp_variant_barrier.py [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from exp_bpe_base_ckpt import jvm_cpu_seconds  # noqa: E402


def _variant_df(spark, sf_dir, barrier: str):
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.registry import load

    o = load(spark, sf_dir, "orders")
    js = F.concat(
        F.lit('{"id":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"st":"'),
        F.col("o_orderstatus"),
        F.lit('","pri":"'),
        F.col("o_orderpriority"),
        F.lit('","arr":['),
        F.col("o_custkey").cast("string"),
        F.lit(","),
        F.col("o_orderkey").cast("string"),
        F.lit('],"maybe":null}'),
    )
    v = o.select("o_orderkey", F.parse_json(js).alias("v"))
    if barrier == "repartition":
        v = v.repartition(F.col("o_orderkey"))
    elif barrier == "persist":
        v = v.persist()
    elif barrier == "none":
        pass
    else:
        raise ValueError(barrier)
    return v.select(
        "o_orderkey",
        F.variant_get("v", "$.id", "bigint").alias("vid"),
        F.variant_get("v", "$.pri", "string").alias("vpri"),
        F.variant_get("v", "$.arr[1]", "bigint").alias("varr1"),
        F.when(
            F.is_variant_null(F.variant_get("v", "$.maybe", "variant")), 1
        )
        .otherwise(0)
        .alias("maybe_is_null"),
        F.when(F.try_variant_get("v", "$.st", "bigint").isNull(), 1)
        .otherwise(0)
        .alias("bad_cast_null"),
        F.schema_of_variant("v").alias("vschema"),
    )


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from bench import _cpu_probe, _cpu_probe_parallel

    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="exp-variant-barrier", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    # warm codegen for the expression set once
    _variant_df(spark, sf, "repartition").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    cpu: dict[str, list[float]] = {}
    probes = (_cpu_probe(), _cpu_probe_parallel())
    # interleave variants so host drift hits both equally
    for _ in range(n_runs):
        for barrier in ("repartition", "persist", "none"):
            spark.catalog.clearCache()
            t0, c0 = time.perf_counter(), jvm_cpu_seconds()
            _variant_df(spark, sf, barrier).write.format("noop").mode(
                "overwrite"
            ).save()
            out.setdefault(barrier, []).append(
                round(time.perf_counter() - t0, 3)
            )
            cpu.setdefault(barrier, []).append(
                round(jvm_cpu_seconds() - c0, 3)
            )
    probes_after = (_cpu_probe(), _cpu_probe_parallel())
    print(
        json.dumps(
            {
                "min": {k: min(v) for k, v in out.items()},
                "cpu_min": {k: min(v) for k, v in cpu.items()},
                "runs": out,
                "cpu": cpu,
                "probes": [probes, probes_after],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
