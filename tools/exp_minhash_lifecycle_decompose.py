"""Decompose the two near-linear minhash-index serving exponents
(VERDICT r13 #6): `dedup_minhash_index_delete_md5` (α=0.90) and
`stream_minhash_ingest` (α=0.84) are REGISTERED LIFECYCLE ARMS — each
runs an index BUILD plus the serving op inside one query, so the
headline exponent mixes a correctly-linear corpus scan with the op
under adjudication. This experiment times the phases separately at two
SFs and answers: is the DELETE (resp. the STREAMING MACHINERY) the
near-linear part, or the build it rides with?

- delete arm phases: build_minhash_index (full corpus scan — linear by
  design), delete_from_minhash_index (tombstone sidecar append —
  should be O(|delete set|)), probe_minhash_index self-probe (band
  join over all signatures — linear candidate volume by corpus).
- ingest arm phases: initial build (<250), then the SAME batch splits
  the streaming query ingests (250..374, 375..) executed as PLAIN
  batch probe+append calls — the delta between the registered
  streaming arm's time and this batch-equivalent is the Structured
  Streaming machinery's fixed overhead (2 triggers at every SF, since
  the registered arm pins absolute doc_id split points and batch 2
  grows linearly with the corpus).

Output: SCALING.json["minhash_lifecycle_decompose"] + printed rows.
Usage: python tools/exp_minhash_lifecycle_decompose.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SFS = {
    "sf0.1": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "sf1": os.path.join(REPO, "spark-warehouse", "sf1"),
}
RUNS = 3  # min-of-3 after one warm pass, same protocol as bench.py


def _timeit(fn) -> float:
    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def measure(spark, sf_name: str, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        delete_from_minhash_index,
        probe_minhash_index,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = d.count()
    table = "mh_decomp_idx"
    out: dict = {"n_docs": n}

    # one warm pass of the full lifecycle (JIT/codegen), untimed
    build_minhash_index(spark, d, table=table, family="md5")
    delete_from_minhash_index(
        spark, d.filter(F.col("doc_id") % 5 == 2).select("doc_id"),
        table=table,
    )
    probe_minhash_index(spark, d, table=table, self_probe=True).count()

    out["build_sec"] = _timeit(
        lambda: build_minhash_index(spark, d, table=table, family="md5")
    )
    # delete is timed against a FRESH build each run (tombstones are
    # idempotent per generation; rebuild clears them) — rebuild outside
    # the timer
    del_set = d.filter(F.col("doc_id") % 5 == 2).select("doc_id")
    runs = []
    for _ in range(RUNS):
        build_minhash_index(spark, d, table=table, family="md5")
        t0 = time.perf_counter()
        delete_from_minhash_index(spark, del_set, table=table)
        runs.append(time.perf_counter() - t0)
    out["delete_sec"] = round(min(runs), 3)
    out["probe_sec"] = _timeit(
        lambda: probe_minhash_index(
            spark, d, table=table, self_probe=True
        ).count()
    )

    # ingest arm: batch-equivalent of the registered streaming splits
    b0 = d.filter(F.col("doc_id") < 250)
    b1 = d.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 375))
    b2 = d.filter(F.col("doc_id") >= 375)
    runs = []
    for _ in range(RUNS):
        build_minhash_index(spark, b0, table=table, family="md5")
        t0 = time.perf_counter()
        for batch in (b1, b2):
            probe_minhash_index(
                spark, batch, table=table, self_probe=False
            ).count()
            append_minhash_index(spark, batch, table=table)
        runs.append(time.perf_counter() - t0)
    out["ingest_batch_equiv_sec"] = round(min(runs), 3)

    # the registered streaming arm, same protocol (includes its inner
    # initial build + the Structured Streaming machinery)
    from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

    q = load_all_operators()["stream_minhash_ingest"]
    q.fn(spark, sf_dir).count()  # warm
    out["stream_arm_total_sec"] = _timeit(
        lambda: q.fn(spark, sf_dir).count()
    )
    for side in ("", "__tombstones", "__pairs"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{side}")
    return out


def main() -> None:
    from bench import CPUS
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    spark = get_spark(
        app_name="mh-decompose",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    out: dict = {
        "method": f"min of {RUNS} warm runs per phase; delete re-timed "
        "against a fresh build each run; ingest batch-equivalent = the "
        "registered streaming splits executed as plain probe+append",
    }
    for name, sf_dir in SFS.items():
        out[name] = measure(spark, name, sf_dir)
        print(f"[{name}] {out[name]}", flush=True)
    r = out["sf1"]["n_docs"] / out["sf0.1"]["n_docs"]
    for phase in (
        "build_sec", "delete_sec", "probe_sec",
        "ingest_batch_equiv_sec", "stream_arm_total_sec",
    ):
        a, b = out["sf0.1"][phase], out["sf1"][phase]
        out[f"alpha_{phase}"] = (
            round(math.log(b / a) / math.log(r), 3) if a and b else None
        )
    print({k: v for k, v in out.items() if k.startswith("alpha")},
          flush=True)
    path = os.path.join(REPO, "SCALING.json")
    doc = json.load(open(path))
    doc["minhash_lifecycle_decompose"] = out
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"wrote minhash_lifecycle_decompose to {path}")


if __name__ == "__main__":
    main()
