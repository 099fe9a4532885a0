"""Quantizer-drift ledger (r13) — the evidence behind the drift report's
retrain trigger and `requantize_ann_index`'s payoff claim.

`append_to_ann_index` freezes the quantizer (the FAISS add-after-train
choice; its docstring prices the trade as "re-train on a cadence").
This tool MEASURES what that debt actually costs and what requantize
recovers, instead of guessing:

Protocol (deterministic end to end — no RNG at measurement time):

1. Build the persisted √N-cell IVFADC index over the BASE corpus
   (sf1 = 20k vectors, the recall ledger's scale).
2. Synthesize a DRIFTED append batch: every base vector shifted by +s
   in dimension 0 and renormalized (s swept over DRIFT_SHIFTS) — a new
   region of embedding space the frozen seeds never saw. Append it
   through the production `append_to_ann_index`.
3. Measure, through the PRODUCTION serving path
   (`probe_ann_index_refined` at the certified external knobs —
   nprobe 16 / R 300 / no self-exclusion, SCALE.md §Round 12):
   - recall@10 of held-out queries jittered from the DRIFTED region
     (integer-LCG jitter, amplitude 0.13 — the `_external_queries`
     construction) vs the numpy exact top-10 over the CURRENT corpus;
   - the same for held-out queries from the BASE region (drift must
     not be "paid" by old traffic silently);
   - the drift report (`quantizer_drift_report`): imbalance_factor,
     top_cell_share, empty cells;
   - mean scanned fraction per drifted-region query (probed cells'
     population / N) — the candidate-volume cost the skew inflates.
4. `requantize_ann_index` (md5-spread seeds over the CURRENT corpus),
   re-measure all of the above. The delta is the payoff.

Output: SCALING.json["ann_index_quantizer_drift"] + a printed table
(SCALE.md §Round 13 records the certified trigger).

Usage: python tools/bench_quantizer_drift.py [shift ...]
       (default shifts: 0.5 2.0; requires spark-warehouse/sf1 —
       tools/make_sf.py 10)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_ann_recall import _topk_ids  # noqa: E402 (shared rank kernel)

K = 10
N_QUERIES = 100
NPROBE = 16          # certified external serving knobs (SCALE.md r12)
REFINE_DEPTH = 300
DRIFT_SHIFTS = (0.5, 2.0)
SF_DIR = os.path.join(REPO, "spark-warehouse", "sf1")
TABLE = "ann_drift_ledger_idx"


def _lcg_jitter(V: np.ndarray, qids: np.ndarray, amp: float = 0.13) -> np.ndarray:
    """The `_external_queries` integer-LCG jitter, vectorized: held-out
    queries near (never equal to) corpus rows — the serving regime."""
    dims = np.arange(1, V.shape[1] + 1, dtype=np.int64)
    u = (((qids[:, None] + 1) * 1000003 + dims[None, :] * 7919) % 97) / 97.0 - 0.5
    Q = V + amp * u
    return Q / np.linalg.norm(Q, axis=1, keepdims=True)


def _recall(spark, table, vectors, Q: np.ndarray, exact: list[set]) -> float:
    """recall@10 through the production refined serving path."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        probe_ann_index_refined,
    )

    rows = [(int(j), [float(x) for x in Q[j]]) for j in range(len(Q))]
    qf = spark.createDataFrame(rows, "qid bigint, qemb array<double>")
    got: dict[int, list[int]] = {j: [] for j in range(len(Q))}
    res = probe_ann_index_refined(
        spark, qf, vectors, table=table, nprobe=NPROBE, k=K,
        refine_depth=REFINE_DEPTH, exclude_self=False,
    ).collect()
    for r in res:
        got[r["qid"]].append(r["vec_id"])
    per_q = [len(set(got[j]) & exact[j]) / K for j in range(len(Q))]
    return round(float(np.mean(per_q)), 4)


def _scanned_fraction(spark, table, Q: np.ndarray) -> float:
    """Mean fraction of the corpus the probed cells contain for these
    queries — the candidate-volume cost skew inflates. Uses the stored
    quantizer via the production `_ivf_probes` path."""
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.operators.similarity import (
        _ivf_probes,
    )
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _current_build_id,
    )

    books = spark.table(f"{table}__codebooks")
    current = _current_build_id(spark, table)
    sizes = {
        r["cell"]: r["n"]
        for r in spark.table(table)
        .filter(F.col("build_id") == current)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_rows = sum(sizes.values())
    rows = [(int(j), [float(x) for x in Q[j]]) for j in range(len(Q))]
    qf = spark.createDataFrame(rows, "qid bigint, qemb array<double>")
    probes = _ivf_probes(qf, books.select("__seeds"), nprobe=NPROBE).collect()
    per_q: dict[int, int] = {}
    for r in probes:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + sizes.get(r["cell"], 0)
    return round(float(np.mean(list(per_q.values()))) / n_rows, 5)


def measure_shift(spark, E: np.ndarray, shift: float) -> dict:
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        append_to_ann_index,
        build_ann_index,
        quantizer_drift_report,
        requantize_ann_index,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load

    n = len(E)
    base = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    build_ann_index(spark, SF_DIR, table=TABLE, n_buckets=8, vectors=None)

    # drifted delta: +shift in dim0, renormalized, ids offset by n
    D = E.copy()
    D[:, 0] += shift
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    shifted = F.expr(
        f"transform(emb, (v, i) -> CASE WHEN i = 0 THEN v + {shift}D "
        "ELSE v END)"
    )
    unit = F.expr(
        "transform(__s, v -> v / sqrt(aggregate(transform(__s, x -> x * x),"
        " 0.0D, (a, b) -> a + b)))"
    )
    delta = (
        base.select((F.col("vec_id") + n).alias("vec_id"), shifted.alias("__s"))
        .select("vec_id", unit.alias("emb"))
    )
    append_to_ann_index(spark, delta, table=TABLE)
    corpus_np = np.vstack([E, D])
    vectors = base.unionByName(delta)

    # held-out query batches: drifted region + base region
    drift_qids = np.arange(N_QUERIES, dtype=np.int64) * 37 % n + n
    base_qids = np.arange(N_QUERIES, dtype=np.int64) * 37 % n
    Qd = _lcg_jitter(corpus_np[drift_qids], drift_qids)
    Qb = _lcg_jitter(corpus_np[base_qids], base_qids)
    exact_d = _exact_topk_for_rows(Qd, corpus_np)
    exact_b = _exact_topk_for_rows(Qb, corpus_np)

    def phase(name: str) -> dict:
        rep = quantizer_drift_report(spark, TABLE)
        out = {
            "imbalance_factor": rep["imbalance_factor"],
            "top_cell_share": rep["top_cell_share"],
            "empty_cell_fraction": rep["empty_cell_fraction"],
            "n_cells": rep["n_cells"],
            "recall_drifted_queries": _recall(spark, TABLE, vectors, Qd, exact_d),
            "recall_base_queries": _recall(spark, TABLE, vectors, Qb, exact_b),
            "scanned_fraction_drifted": _scanned_fraction(spark, TABLE, Qd),
            "scanned_fraction_base": _scanned_fraction(spark, TABLE, Qb),
        }
        print(f"  [{name}] {out}", flush=True)
        return out

    appended = phase(f"shift={shift} appended(frozen quantizer)")
    requantize_ann_index(spark, vectors, table=TABLE)
    requantized = phase(f"shift={shift} requantized(md5-spread seeds)")
    return {
        "shift": shift,
        "n_base": n,
        "n_appended": n,
        "appended_frozen": appended,
        "requantized": requantized,
    }


def _exact_topk_for_rows(Q: np.ndarray, E: np.ndarray) -> list[set]:
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    sims = En @ Q.T
    ids = np.arange(len(E), dtype=np.int64)
    return [set(_topk_ids(sims[:, j], ids, K)) for j in range(Q.shape[0])]


def main() -> None:
    from bench import CPUS
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    if not os.path.isdir(SF_DIR):
        raise SystemExit("spark-warehouse/sf1 missing — run tools/make_sf.py 10")
    shifts = [float(s) for s in sys.argv[1:]] or list(DRIFT_SHIFTS)
    spark = get_spark(
        app_name="bench-quantizer-drift",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.registry import load

    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .orderBy("vec_id")
        .collect()
    )
    E = np.array([r["emb"] for r in rows], dtype=np.float64)
    out = {
        "k": K,
        "n_queries": N_QUERIES,
        "nprobe": NPROBE,
        "refine_depth": REFINE_DEPTH,
        "protocol": "base corpus sf1 (20k); drifted delta = +shift in dim0,"
        " renormalized, appended via append_to_ann_index (frozen"
        " quantizer); held-out LCG-jittered queries from drifted and base"
        " regions served via probe_ann_index_refined at the certified"
        " external knobs; exact baseline = numpy cosine top-10 over the"
        " current corpus; then requantize_ann_index (md5-spread seeds)"
        " and re-measure",
        "shifts": [measure_shift(spark, E, s) for s in shifts],
    }
    for side in ("", "__codebooks", "__tombstones"):
        spark.sql(f"DROP TABLE IF EXISTS {TABLE}{side}")
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as fh:
        rec = json.load(fh)
    rec["ann_index_quantizer_drift"] = out
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"wrote ann_index_quantizer_drift to {path}")


if __name__ == "__main__":
    main()
