"""Batched-BPE vocab scaling evidence (VERDICT r14 #2's 'Done' rider):
train a DEMO-×-many vocab with the batched trainer at sf0.1 and record
merges/round and seconds/merge, demonstrating the one-job-per-merge
ceiling is gone: at K merges per round, a 30k-merge production vocab
needs ~30k/K driver rounds, and the per-round cost is one pair-count
aggregation over the (Heaps'-law sublinear) unique-word state
regardless of K.

    python tools/exp_bpe_vocab_scale.py [sf_dir] [rounds] [k] [pool]

Appends a ``bpe_batched_vocab`` section to SCALING.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
        _train_batched,
    )
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    pool = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * 8
    spark = get_spark(
        app_name="bpe-vocab-scale", master="local[32]", shuffle_partitions=32
    )

    t0 = time.perf_counter()
    merges, wf = _train_batched(spark, sf, rounds=rounds, k=k, pool=pool)
    # force the final word state so the last round's replace is paid
    n_words = wf.count()
    wall = round(time.perf_counter() - t0, 3)

    per_round: dict[int, int] = {}
    for rnd, *_ in merges:
        per_round[rnd] = per_round.get(rnd, 0) + 1
    out = {
        "sf_dir": sf,
        "rounds_requested": rounds,
        "k": k,
        "pool": pool,
        "merges_learned": len(merges),
        "merges_per_round": round(len(merges) / max(per_round and len(per_round) or 1, 1), 2),
        "unique_words": n_words,
        "wall_sec": wall,
        "sec_per_merge": round(wall / max(len(merges), 1), 3),
        "sec_per_round": round(wall / max(len(per_round), 1), 3),
    }
    path = os.path.join(REPO, "SCALING.json")
    doc = json.load(open(path))
    doc["bpe_batched_vocab"] = out
    json.dump(doc, open(path, "w"), indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
