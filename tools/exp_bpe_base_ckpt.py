"""A/B: localCheckpoint on the BPE trainer's BASE word-freq state.

Hypothesis (round 15): `_train`/`_train_batched` compute the base
`_word_freqs` frame — the only full-corpus pass of training (explode all
text to words + groupBy) — TWICE: once for the round-1 argmax job, and
again when round 1's lazy `localCheckpoint` materializes inside round 2's
job (the checkpoint truncates lineage from round 1 onward, but its own
computation re-runs the un-checkpointed base). Checkpointing the base
frame makes the round-1 argmax materialize it once; every later round
reads the blocks.

Protocol: variants INTERLEAVED in one session (host weather hits both
equally), min-of-N wall seconds AND JVM CPU seconds per run (CPU time is
robust to external core contention — the metric that adjudicates when
ambient load moves wall time). The B arm is applied by wrapping
`_word_freqs`; results (merge tables) are asserted identical.

Usage: python tools/exp_bpe_base_ckpt.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def jvm_cpu_seconds() -> float:
    """utime+stime of this process's java child (local[*]: ALL executor
    work happens there)."""
    me = os.getpid()
    tck = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                s = fh.read()
            comm = s[s.index("(") + 1 : s.rindex(")")]
            rest = s[s.rindex(")") + 2 :].split()
            if "java" not in comm or int(rest[1]) != me:
                continue
            return (int(rest[11]) + int(rest[12])) / tck
        except (OSError, ValueError, IndexError):
            continue
    return 0.0


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import wod_ascii_to_parquet_spark_spark.operators.text_bpe as tb
    from wod_ascii_to_parquet_spark_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="exp-bpe-base-ckpt", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    orig_wf = tb._word_freqs

    def ckpt_wf(spark, sf_dir, where=None):
        return orig_wf(spark, sf_dir, where=where).localCheckpoint(
            eager=False
        )

    # If the installed code already checkpoints the base (post-change
    # tree), the A arm strips it by timing against a re-derived plain
    # frame is impossible — so this experiment must run on the PRE-change
    # tree; it asserts that by checking the plan of _word_freqs' result.
    is_pre = "LogicalRDD" not in orig_wf(
        spark, sf
    )._jdf.queryExecution().optimizedPlan().toString()
    if not is_pre:
        print("WARNING: tree already checkpoints the base; A==B")

    def run_train(variant: str):
        tb._word_freqs = ckpt_wf if variant == "ckpt" else orig_wf
        try:
            t0w, t0c = time.perf_counter(), jvm_cpu_seconds()
            merges, _ = tb._train(spark, sf)
            return (
                round(time.perf_counter() - t0w, 3),
                round(jvm_cpu_seconds() - t0c, 3),
                merges,
            )
        finally:
            tb._word_freqs = orig_wf

    # warm both variants once (codegen/JIT)
    base_merges = run_train("plain")[2]
    assert run_train("ckpt")[2] == base_merges, "variant changed results!"

    wall: dict[str, list[float]] = {"plain": [], "ckpt": []}
    cpu: dict[str, list[float]] = {"plain": [], "ckpt": []}
    for _ in range(n_rounds):
        for variant in ("plain", "ckpt"):
            spark.catalog.clearCache()
            w, c, m = run_train(variant)
            assert m == base_merges
            wall[variant].append(w)
            cpu[variant].append(c)
    print(
        json.dumps(
            {
                "wall_min": {k: min(v) for k, v in wall.items()},
                "cpu_min": {k: min(v) for k, v in cpu.items()},
                "wall": wall,
                "cpu": cpu,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
