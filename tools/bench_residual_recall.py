"""Residual-PQ recall ledger (r13) — does the FAISS residual encoding
(`similarity_ann_ivf_adc_residual`) actually buy recall at the same
8 bytes/vector, on THIS data?

The claim residual encoding rests on: within one IVF cell every vector
shares the cell's offset from the origin, so raw-vector PQ spends its
16 centroids per subspace encoding WHERE THE CELL IS; re-centering each
cell on the origin (emb − centroid) lets all 8·16 codebook entries
resolve within-cell structure. This tool measures the claim instead of
asserting it: recall@10 for 100 corpus queries (self excluded) at
nprobe 1..8 over sf1 (20k vectors), raw ADC vs residual ADC, identical
probing, identical candidate sets — only the code geometry differs, so
any recall delta is attributable to the encoding.

The numpy kernels mirror the registered queries' arithmetic exactly
(medoid codebooks, strictly-less argmin tie-break, (dist, vec_id)
ranking) and are PINNED to the DuckDB-oracled Spark output at fixture
scale by tests/test_ann_recall_tool.py::test_residual_tool_kernel — the
same gate discipline as tools/bench_ann_recall.py.

Output: SCALING.json["ann_recall_residual"] + printed table.

Usage: python tools/bench_residual_recall.py
       (requires spark-warehouse/sf1 — tools/make_sf.py 10)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_ann_recall import _bottomk_ids, _topk_ids  # noqa: E402

K = 10
N_QUERIES = 100
N_CELLS = 16
NPROBES = (1, 2, 4, 8)
M, SUBDIM, PQ_K = 8, 8, 16
SF_DIR = os.path.join(REPO, "spark-warehouse", "sf1")


def ivf_assign(E: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """argmax of dot/||seed|| per row; first max = lowest cell (the
    fold's strictly-greater replace)."""
    scores = E @ (seeds / np.linalg.norm(seeds, axis=1, keepdims=True)).T
    return np.argmax(scores, axis=1)


def pq_codes(V: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin of ||c||^2 - 2 a.c per subspace; first min = lowest cent
    (the fold's strictly-less replace). cb layout: (s, cent, dim)."""
    n = len(V)
    out = np.empty((n, M), dtype=np.int64)
    sub = V.reshape(n, M, SUBDIM)
    for s in range(M):
        C = cb[s]  # (k, dim)
        dsel = (C * C).sum(axis=1)[None, :] - 2.0 * (sub[:, s, :] @ C.T)
        out[:, s] = np.argmin(dsel, axis=1)
    return out


def adc_rank(qtab: np.ndarray, codes: np.ndarray, ids: np.ndarray, k: int):
    """qtab: (s, cent) full-L2 tables for ONE query('s one cell-context);
    codes: (n, M) for the candidate rows; rank by (sum-lookup ASC, id)."""
    dists = np.zeros(len(ids), dtype=np.float64)
    for s in range(M):
        dists += qtab[s, codes[:, s]]
    return dists


def measure(E: np.ndarray) -> dict:
    n = len(E)
    seeds = E[:N_CELLS]
    cells = ivf_assign(E, seeds)
    members = {c: np.where(cells == c)[0] for c in range(N_CELLS)}

    # raw tier: one codebook, one qtab per query
    raw_cb = E[:PQ_K].reshape(PQ_K, M, SUBDIM).transpose(1, 0, 2)
    raw_codes = pq_codes(E, raw_cb)
    # residual tier: medoid codebook from the residuals of vectors
    # 16..31 — NOT 0..15: those ARE the IVF seeds, whose residuals are
    # identically zero (each is its own nearest cell), and an all-zero
    # codebook collapses every code/distance (measured: recall 0.0)
    R = E - seeds[cells]
    res_cb = R[PQ_K : 2 * PQ_K].reshape(PQ_K, M, SUBDIM).transpose(1, 0, 2)
    res_codes = pq_codes(R, res_cb)

    norms = np.linalg.norm(E, axis=1)
    Q = E[:N_QUERIES]
    sims = (E @ Q.T) / (norms[:, None] * norms[None, :N_QUERIES])
    all_ids = np.arange(n, dtype=np.int64)
    exact = {}
    for q in range(N_QUERIES):
        mask = all_ids != q
        exact[q] = set(_topk_ids(sims[mask, q], all_ids[mask], K))

    qscores = Q @ (seeds / np.linalg.norm(seeds, axis=1, keepdims=True)).T
    probe_order = np.argsort(-qscores, axis=1, kind="stable")  # ties: low cell

    def qtab_for(qvec: np.ndarray, cb: np.ndarray) -> np.ndarray:
        qs = qvec.reshape(M, SUBDIM)
        diff = qs[:, None, :] - cb  # (s, cent, dim)
        return np.einsum("scd,scd->sc", diff, diff)

    out: dict = {}
    for nprobe in NPROBES:
        rec = {"raw": [], "residual": []}
        for q in range(N_QUERIES):
            probed = probe_order[q, :nprobe]
            cand = np.concatenate([members[c] for c in probed])
            cand = cand[cand != q]
            # raw: one table, all candidates
            d_raw = adc_rank(qtab_for(Q[q], raw_cb), raw_codes[cand], cand, K)
            got_raw = set(_bottomk_ids(d_raw, cand, K))
            # residual: per-cell tables on (q - centroid)
            ids_parts, d_parts = [], []
            for c in probed:
                mem = members[c]
                mem = mem[mem != q]
                if len(mem) == 0:
                    continue
                qt = qtab_for(Q[q] - seeds[c], res_cb)
                ids_parts.append(mem)
                d_parts.append(adc_rank(qt, res_codes[mem], mem, K))
            ids_all = np.concatenate(ids_parts)
            d_all = np.concatenate(d_parts)
            got_res = set(_bottomk_ids(d_all, ids_all, K))
            rec["raw"].append(len(got_raw & exact[q]) / K)
            rec["residual"].append(len(got_res & exact[q]) / K)
        scanned = round(
            float(
                np.mean(
                    [
                        sum(len(members[c]) for c in probe_order[q, :nprobe])
                        for q in range(N_QUERIES)
                    ]
                )
            )
            / n,
            5,
        )
        out[f"nprobe_{nprobe}"] = {
            "recall_raw_adc": round(float(np.mean(rec["raw"])), 4),
            "recall_residual_adc": round(float(np.mean(rec["residual"])), 4),
            "scanned_fraction": scanned,
        }
        print(f"  nprobe={nprobe}: {out[f'nprobe_{nprobe}']}", flush=True)
    return out


def main() -> None:
    import duckdb

    if not os.path.isdir(SF_DIR):
        raise SystemExit("spark-warehouse/sf1 missing — run tools/make_sf.py 10")
    con = duckdb.connect()
    E = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT embedding::DOUBLE[] FROM "
                f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
            ).fetchall()
        ],
        dtype=np.float64,
    )
    print(f"N={len(E)}")
    out = {
        "k": K,
        "n_queries": N_QUERIES,
        "n_cells": N_CELLS,
        "protocol": "sf1 corpus queries (self excluded); identical 16-cell"
        " probing for both tiers, so candidate sets match and any recall"
        " delta is the code geometry; medoid codebooks (raw: first-16"
        " vectors; residual: first-16 residuals); numpy kernels pinned to"
        " the DuckDB-oracled registered queries at fixture scale"
        " (tests/test_ann_recall_tool.py)",
        "sf1": measure(E),
    }
    path = os.path.join(REPO, "SCALING.json")
    with open(path) as fh:
        rec = json.load(fh)
    rec["ann_recall_residual"] = out
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"wrote ann_recall_residual to {path}")


if __name__ == "__main__":
    main()
