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
the strictly harder case.

Crash-injection arm (VERDICT r11 #4): a worker SIGKILLs itself between
the bands append and the sidecar append — a real kill -9 corpse in the
exact torn window — and a successor process over the persistent derby
catalog must observe the torn report, unchanged probe output, and full
recovery (re-append + vacuum ≡ fresh build). No sleeps anywhere: the
kill is delivered deterministically by the append's fault-injection
hook, and phase files are the only synchronization."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

WORKER = os.path.join(os.path.dirname(__file__), "index_race_worker.py")


def _spawn(role: str, root: str):
    """Start a worker with stdout/stderr to FILES (not pipes — Spark's
    stderr volume can fill a pipe buffer and deadlock a polling parent)."""
    env = dict(
        os.environ,
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(WORKER))),
    )
    out = open(os.path.join(root, f"{role}.out"), "wb")
    err = open(os.path.join(root, f"{role}.err"), "wb")
    p = subprocess.Popen(
        [sys.executable, WORKER, role, root], env=env, stdout=out, stderr=err
    )
    p._logs = (out, err)  # type: ignore[attr-defined]
    return p


def _err_tail(root: str, role: str) -> str:
    with open(os.path.join(root, f"{role}.err"), "rb") as fh:
        return fh.read().decode(errors="replace")[-4000:]


def test_probe_during_concurrent_append_sees_no_mixed_generation(tmp_path):
    root = str(tmp_path)
    procs = {role: _spawn(role, root) for role in ("appender", "prober")}
    deadline = time.time() + 420
    try:
        # Poll BOTH processes (ADVICE r11): if one dies nonzero while the
        # other still runs, kill the survivor immediately so the failure
        # surfaces as a prompt assertion naming the dead worker, not a
        # 420 s TimeoutError from a prober spinning against a corpse.
        while any(p.poll() is None for p in procs.values()):
            assert time.time() < deadline, "race workers exceeded deadline"
            for role, p in procs.items():
                rc = p.poll()
                if rc is not None and rc != 0:
                    for q in procs.values():
                        if q.poll() is None:
                            q.kill()
                    raise AssertionError(
                        f"{role} died rc={rc}:\n{_err_tail(root, role)}"
                    )
            time.sleep(0.1)
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
            for fh in p._logs:  # type: ignore[attr-defined]
                fh.close()
    for role, p in procs.items():
        assert p.returncode == 0, f"{role} failed:\n{_err_tail(root, role)}"

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


def test_kill9_mid_append_heals_to_fresh_build(tmp_path):
    """kill -9 between the bands append and the sidecar append, then the
    full documented recovery in a successor process. Three claims:

    1. the corpse really died by SIGKILL with the bands half committed
       (phase file present, recovery.json shows torn doc_ids);
    2. the torn index NEVER returns wrong pairs — probes equal the
       pre-append set exactly (half-visible docs vanish);
    3. re-append + vacuum converges to consistent=true and probe output
       row-identical to an index built fresh over the union."""
    root = str(tmp_path)
    torn = _spawn("torn-appender", root)
    rc = torn.wait(timeout=420)
    for fh in torn._logs:  # type: ignore[attr-defined]
        fh.close()
    assert rc == -signal.SIGKILL, (
        f"torn-appender should die by SIGKILL, got rc={rc}:\n"
        f"{_err_tail(root, 'torn-appender')}"
    )
    assert os.path.exists(os.path.join(root, "phase_bands_committed")), (
        "the kill fired outside the bands→sidecar window"
    )
    with open(os.path.join(root, "ready.json")) as fh:
        initial = [tuple(p) for p in json.load(fh)["initial"]]

    rec = _spawn("recoverer", root)
    rc = rec.wait(timeout=420)
    for fh in rec._logs:  # type: ignore[attr-defined]
        fh.close()
    assert rc == 0, f"recoverer failed:\n{_err_tail(root, 'recoverer')}"
    with open(os.path.join(root, "recovery.json")) as fh:
        doc = json.load(fh)

    # (1) verify-index sees the torn append the O(1) probe check cannot
    assert doc["report_torn"]["band_docids_missing_sidecar"] > 0
    assert doc["report_torn"]["consistent"] is False
    # (2) torn probes are exact, not wrong — the crashed delta vanishes
    assert [tuple(p) for p in doc["torn_probe"]] == initial
    # (3) recovery converges: consistent, single generation, and probe
    # output row-identical to a fresh build over the union
    assert doc["report_healed"]["consistent"] is True
    assert doc["report_healed"]["current_generation_only"] is True
    assert doc["healed_probe"] == doc["fresh_probe"]
    assert len(doc["healed_probe"]) > len(initial)  # the delta landed


def test_vacuum_vs_append_cross_process_fence(tmp_path):
    """VERDICT r12 #6: the scheduled-maintenance collision table_cli
    invites — a vacuum racing a live appender could drop the appended
    generation with the directory it replaces, silently. The advisory
    filesystem lock fence must turn BOTH directions of the collision
    into NAMED refusals across a process boundary (the vacuumer's
    refusal arrives before any catalog access — its in-memory catalog
    cannot even see the appender's tables), and the serialized aftermath
    must converge to a consistent index probe-identical to a fresh
    build. Never a mixed generation."""
    root = str(tmp_path)
    procs = {
        role: _spawn(role, root) for role in ("vac-appender", "vac-vacuumer")
    }
    deadline = time.time() + 420
    try:
        while any(p.poll() is None for p in procs.values()):
            assert time.time() < deadline, "vacuum-race workers exceeded deadline"
            for role, p in procs.items():
                rc = p.poll()
                if rc is not None and rc != 0:
                    for q in procs.values():
                        if q.poll() is None:
                            q.kill()
                    raise AssertionError(
                        f"{role} died rc={rc}:\n{_err_tail(root, role)}"
                    )
            time.sleep(0.1)
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
            for fh in p._logs:  # type: ignore[attr-defined]
                fh.close()
    for role, p in procs.items():
        assert p.returncode == 0, f"{role} failed:\n{_err_tail(root, role)}"

    with open(os.path.join(root, "vac_race_result.json")) as fh:
        result = json.load(fh)
    with open(os.path.join(root, "vacuumer_log.json")) as fh:
        vlog = json.load(fh)
    # direction 1: real append refused while the other process held the
    # vacuum lock — named, cross-process, before any data was written
    assert result["log"]["append_during_vacuum"].startswith("refused:"), (
        result["log"]
    )
    assert "vacuum" in result["log"]["append_during_vacuum"]
    # direction 1b (r13 third mutator): a real takedown refused against
    # the same held vacuum — a tombstone written mid-vacuum would be
    # cleared without its rows being dropped (silent resurrection)
    assert result["log"]["delete_during_vacuum"].startswith("refused:"), (
        result["log"]
    )
    # direction 2: real vacuum refused while the appender held its
    # mutator locks (append + delete) — purely via the shared filesystem
    assert vlog["vacuum_during_append"].startswith("refused:"), vlog
    # aftermath: serialized re-append + takedown + vacuum converge to a
    # consistent index, the tombstone physically reclaimed from both
    # sides, probe-identical to a fresh build over (union minus the
    # deleted doc) — the refusals lost no data and resurrected none
    assert result["consistent"] is True
    assert result["tombstones_reclaimed"] is True
    assert result["healed_equals_fresh"] is True


def test_vacuum_vs_append_threads_serialize_or_refuse(spark):
    """The SAME-DRIVER collision (one long-lived session, an ingest loop
    and a scheduled vacuum thread): under the fence every operation
    either completes or raises IndexMaintenanceConflict, and afterwards
    the index is consistent and probe-identical to a fresh build over
    the base plus exactly the deltas whose appends SUCCEEDED."""
    import threading

    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        IndexMaintenanceConflict,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
        vacuum_minhash_index,
        verify_minhash_index,
    )

    docs_path = "/root/testdata/sf0.001/documents.parquet"
    table, fresh = "thr_race_idx", "thr_fresh_idx"
    try:
        docs = spark.read.parquet(docs_path).select("doc_id", "text")
        build_minhash_index(
            spark, docs.filter(F.col("doc_id") < 200), table=table,
            family="md5",
        )
        deltas = [(200 + 30 * i, 230 + 30 * i) for i in range(5)]
        appended, vac_outcomes, errors = [], [], []

        def ingest():
            try:
                for lo, hi in deltas:
                    d = docs.filter(
                        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                    )
                    try:
                        append_minhash_index(spark, d, table=table)
                        appended.append((lo, hi))
                    except IndexMaintenanceConflict:
                        pass  # named refusal — the delta is simply absent
            except Exception as e:  # anything else is a real failure
                errors.append(repr(e))

        def maintain():
            try:
                for _ in range(6):
                    try:
                        vac_outcomes.append(
                            ("ok", vacuum_minhash_index(spark, table=table))
                        )
                    except IndexMaintenanceConflict:
                        vac_outcomes.append(("refused", None))
                    time.sleep(0.05)
            except Exception as e:
                errors.append(repr(e))

        t1 = threading.Thread(target=ingest)
        t2 = threading.Thread(target=maintain)
        t1.start(); t2.start(); t1.join(120); t2.join(120)
        assert not errors, errors
        assert not t1.is_alive() and not t2.is_alive()
        report = verify_minhash_index(spark, table=table)
        assert report["consistent"] is True, report
        cond = F.col("doc_id") < 200
        for lo, hi in appended:
            cond = cond | ((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        build_minhash_index(
            spark, docs.filter(cond), table=fresh, family="md5"
        )

        def pairs(t):
            return sorted(
                (r["doc_a"], r["doc_b"], r["jac"])
                for r in probe_minhash_index(
                    spark, docs, table=t, self_probe=True
                ).collect()
            )

        assert pairs(table) == pairs(fresh)
    finally:
        for t in (table, fresh):
            for side in ("", "__docs", "__meta", "__vacuum_tmp"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{side}")
