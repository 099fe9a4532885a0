"""Phase + shape A/B for the MinHash signature chain (round 16).

Phase split first: shingles -> base hashes -> signature, each timed with
the noop sink (wall + JVM CPU), to locate the interpreted-HOF cost.

Then two alternative signature formulations vs the registered
``aggregate``/``zip_with`` fold, results asserted identical:

- ``fold``  (registered): F.aggregate over hashes, zip_with-min of a
  32-wide transform per element — interpreted HOFs, O(|sh|*32) lambda
  evaluations with 2 32-wide array allocations per element.
- ``explode``: explode(hashes) -> groupBy(doc_id).agg(32x min(pmod(...)))
  -> array() — whole-stage-codegen'd arithmetic + partial aggregation;
  the exchange carries one 32-long row per (doc, partition).
- ``numpy``: mapInArrow kernel; the permute-min fold as one vectorized
  numpy pass per batch (exact int64 arithmetic, bit-identical).

Run on a quiet host: python tools/exp_minhash_sig_shapes.py [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from _bench_util import jvm_cpu
from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    _MERSENNE,
    _NPERM,
    minhash_signature,
    shingle_hashes,
    shingles,
)
from wod_ascii_to_parquet_spark_spark.registry import load, spread
from wod_ascii_to_parquet_spark_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark(app_name="minhash-sig-shapes", master="local[32]",
                  shuffle_partitions=32)


def base():
    return spread(load(spark, SF, "documents"))


def stage_shingles():
    return base().select("doc_id", shingles(F.col("text")).alias("sh"))


def stage_hashes():
    return stage_shingles().withColumn("hashes", shingle_hashes(F.col("sh")))


def sig_fold():
    return stage_hashes().withColumn(
        "sig", minhash_signature(F.col("hashes"))
    ).drop("hashes")


def sig_explode():
    h = stage_hashes().select("doc_id", "sh", "hashes")
    ex = h.select("doc_id", F.explode("hashes").alias("h"))
    aggs = [
        F.min(
            F.pmod(
                (2 * p + 3) * F.col("h") + p * 1_000_003, F.lit(_MERSENNE)
            )
        ).alias(f"s{p}")
        for p in range(_NPERM)
    ]
    sig = (
        ex.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[f"s{p}" for p in range(_NPERM)]).alias("sig_agg"),
        )
    )
    # empty shingle set -> no exploded rows -> missing doc: left join,
    # fill with the fold's init value array (min over empty = init).
    init = F.array_repeat(F.lit(_MERSENNE).cast("bigint"), _NPERM)
    return (
        h.select("doc_id", "sh")
        .join(sig, "doc_id", "left")
        .withColumn("sig", F.coalesce(F.col("sig_agg"), init))
        .drop("sig_agg")
    )


def sig_numpy():
    import numpy as np
    import pyarrow as pa

    h = stage_hashes()
    schema_out = "doc_id bigint, sh array<string>, sig array<bigint>"

    A = np.array([2 * p + 3 for p in range(_NPERM)], dtype=np.int64)
    B = np.array([p * 1_000_003 for p in range(_NPERM)], dtype=np.int64)
    M = _MERSENNE

    def kernel(batches):
        for rb in batches:
            doc_id = rb.column("doc_id")
            sh = rb.column("sh")
            hashes = rb.column("hashes")
            sigs = []
            for i in range(rb.num_rows):
                hv = np.asarray(hashes[i].as_py(), dtype=np.int64)
                if hv.size == 0:
                    sigs.append([M] * _NPERM)
                else:
                    vals = (hv[:, None] * A[None, :] + B[None, :]) % M
                    sigs.append(vals.min(axis=0).tolist())
            yield pa.RecordBatch.from_arrays(
                [doc_id, sh, pa.array(sigs, type=pa.list_(pa.int64()))],
                names=["doc_id", "sh", "sig"],
            )

    return h.mapInArrow(kernel, schema_out)


def timeit(tag, mk, sink_cols=None):
    best_w, best_c = 1e9, 1e9
    for _ in range(ROUNDS):
        spark.catalog.clearCache()
        df = mk()
        t0, c0 = time.perf_counter(), jvm_cpu()
        df.write.format("noop").mode("overwrite").save()
        w, c = time.perf_counter() - t0, jvm_cpu() - c0
        best_w, best_c = min(best_w, w), min(best_c, c)
        print(f"{tag:12s} wall {w:7.3f}  cpu {c:7.2f}", flush=True)
    print(f"== {tag:12s} MIN wall {best_w:7.3f}  cpu {best_c:7.2f}", flush=True)
    return best_w, best_c


# identity check of the three signature shapes
a = sig_fold().orderBy("doc_id").select("doc_id", "sig").collect()
b = sig_explode().orderBy("doc_id").select("doc_id", "sig").collect()
c = sig_numpy().orderBy("doc_id").select("doc_id", "sig").collect()
assert a == b, "explode shape differs!"
assert a == c, "numpy shape differs!"
print("identity OK over", len(a), "docs", flush=True)

timeit("scan", lambda: base().select("doc_id", "text"))
timeit("shingles", stage_shingles)
timeit("hashes", stage_hashes)
timeit("sig_fold", sig_fold)
timeit("sig_explode", sig_explode)
timeit("sig_numpy", sig_numpy)
