"""Batched BPE at PRODUCTION-LIKE vocab scale on a character-rich corpus.

The sf* `documents` generator uses a 31-word vocabulary, so BPE training
saturates at 90 merges there (SCALE.md §Round 15) — the corpus, not the
trainer, is the ceiling. This experiment synthesizes a Zipf-distributed
corpus over ~20k DISTINCT character-diverse words (seeded, deterministic)
and trains the batched trainer through hundreds of rounds / ~1k+ merges,
recording wall time per round band — the evidence that round cost stays
flat as the merge count grows (each round is ONE pair-count aggregation
over the unique-word state regardless of K or rank).

    python tools/exp_bpe_rich_corpus.py [n_vocab] [n_docs] [rounds]

Appends ``bpe_rich_corpus`` to SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_corpus(out_dir: str, n_vocab: int, n_docs: int) -> dict:
    rng = np.random.default_rng(42)
    letters = np.array(list(string.ascii_lowercase))
    # skewed letter distribution (English-ish): freq ∝ 1/(rank+2)
    lp = 1.0 / (np.arange(26) + 2.0)
    lp /= lp.sum()
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < n_vocab:
        length = 3 + rng.geometric(0.35)
        w = "".join(rng.choice(letters, size=length, p=lp))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    varr = np.array(vocab)
    # Zipf word frequencies
    zp = 1.0 / (np.arange(n_vocab) + 1.0) ** 1.1
    zp /= zp.sum()
    words_per_doc = 400
    texts = [
        " ".join(rng.choice(varr, size=words_per_doc, p=zp))
        for _ in range(n_docs)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": ["synthetic-zipf"] * n_docs,
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(out_dir, "documents.parquet"))
    return {"n_vocab": n_vocab, "n_docs": n_docs, "words_per_doc": words_per_doc}


def main() -> int:
    from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
        _train_batched,
    )
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    n_vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 140
    spark = get_spark(
        app_name="bpe-rich", master="local[32]", shuffle_partitions=32
    )
    workdir = tempfile.mkdtemp(prefix="bpe_rich_")
    try:
        meta = _make_corpus(workdir, n_vocab, n_docs)
        bands = {}
        for nr in (20, rounds):
            t0 = time.perf_counter()
            merges, _ = _train_batched(
                spark, workdir, rounds=nr, k=8, pool=32
            )
            wall = round(time.perf_counter() - t0, 2)
            n_rounds_used = len({r for r, *_ in merges})
            bands[f"rounds_{nr}"] = {
                "merges": len(merges),
                "rounds_used": n_rounds_used,
                "wall_sec": wall,
                "sec_per_round": round(wall / max(n_rounds_used, 1), 3),
                "sec_per_merge": round(wall / max(len(merges), 1), 4),
            }
            print({f"rounds_{nr}": bands[f"rounds_{nr}"]}, flush=True)
        out = {**meta, **bands}
        # flat-round-cost check: late rounds must not cost more per
        # round than the first 20 (the marginal band isolates rounds
        # 21..N)
        b0, b1 = bands[f"rounds_{20}"], bands[f"rounds_{rounds}"]
        extra_rounds = b1["rounds_used"] - b0["rounds_used"]
        if extra_rounds > 0:
            out["marginal_sec_per_round"] = round(
                (b1["wall_sec"] - b0["wall_sec"]) / extra_rounds, 3
            )
        path = os.path.join(REPO, "SCALING.json")
        doc = json.load(open(path))
        doc["bpe_rich_corpus"] = out
        json.dump(doc, open(path, "w"), indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
