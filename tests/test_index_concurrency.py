"""Cross-PROCESS build/probe race for the persisted minhash index
(VERDICT r10 #6): the torn/double-append healing is tested
single-process; this is the two-JVM deployment shape — an ingest
process appending deltas while a serving process probes the same
warehouse files. See tests/index_race_worker.py for the protocol.

The asserted invariant is the generation sandwich: every concurrent
probe returns a pair set S with initial ⊆ S ⊆ final and no duplicate
(doc_a, doc_b) rows — i.e. the old generation, the new generation, or
a valid append prefix (the bands-before-sidecar write order makes a
half-visible doc VANISH from output instead of corrupting it), never a
mix of garbage. The ANN codes table shares the identical append/commit
mechanics with fewer sides (one data table), so the minhash index is
the strictly harder case."""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "index_race_worker.py")


def test_probe_during_concurrent_append_sees_no_mixed_generation(tmp_path):
    root = str(tmp_path)
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(WORKER))),
    )
    procs = {
        role: subprocess.Popen(
            [sys.executable, WORKER, role, root],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for role in ("appender", "prober")
    }
    outs = {}
    try:
        for role, p in procs.items():
            out, err = p.communicate(timeout=420)
            outs[role] = (p.returncode, out, err)
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
    for role, (rc, out, err) in outs.items():
        assert rc == 0, f"{role} failed:\n{err.decode()[-4000:]}"

    with open(os.path.join(root, "ready.json")) as fh:
        initial = {tuple(p) for p in json.load(fh)["initial"]}
    with open(os.path.join(root, "done.json")) as fh:
        final = {tuple(p) for p in json.load(fh)["final"]}
    with open(os.path.join(root, "observations.json")) as fh:
        doc = json.load(fh)

    assert doc["duplicates"] == 0, "a probe returned duplicated pair rows"
    observations = [{tuple(p) for p in s} for s in doc["observations"]]
    assert observations, "prober recorded no probes"
    assert initial and initial < final  # the appends really grew the set
    for i, s in enumerate(observations):
        assert initial <= s <= final, (
            f"probe {i} returned a mixed generation: "
            f"missing_old={sorted(initial - s)[:5]} "
            f"beyond_new={sorted(s - final)[:5]}"
        )
    # the post-done probe (last observation) must see the full new
    # generation — visibility converges once the append commits
    assert observations[-1] == final
