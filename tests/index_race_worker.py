"""Worker script for the cross-PROCESS persisted-index race test
(VERDICT r10 #6) — run as ``python index_race_worker.py {appender|prober}
<root>`` — and the kill-9 crash-injection arm (VERDICT r11 #4) — run as
``{torn-appender|recoverer} <root>``. Two OS processes, two JVMs, one
shared warehouse directory:

- the APPENDER builds a minhash index over doc_id < 300, publishes the
  table locations + the initial probe pair set, then appends five
  40-doc deltas while the prober runs;
- the PROBER registers EXTERNAL parquet tables over the same locations
  (its own in-memory catalog cannot see the appender's) and probes in a
  loop, refreshing the table file listings each pass — the serving
  pattern of a long-lived prober process.

File-marker protocol under <root>: ready.json (appender: locations +
initial pairs) → b_started (prober's first successful probe) →
appends run → done.json (final pairs) → prober does one last probe and
writes observations.json. The parent test asserts the generation
sandwich: every observed pair set S satisfies initial ⊆ S ⊆ final with
no duplicate (doc_a, doc_b) rows — a probe concurrent with appends sees
the old generation, the new one, or a valid prefix of the append
(bands-before-sidecar write order makes half-visible docs VANISH from
results rather than corrupt them), never a mix of garbage.

Crash-injection arm: the TORN-APPENDER builds the index under a
PERSISTENT metastore (embedded derby under <root>, so a successor
process inherits the catalog — the deployment shape where recovery is
possible at all), then appends a delta with an ``after_bands_hook``
that SIGKILLs its own process between the bands append (committed) and
the sidecar append (never started) — a real process corpse in the
exact torn window, no sleeps, no simulated flag. The RECOVERER is that
successor: it must observe (1) verify_minhash_index reporting the torn
doc_ids / consistent=false, (2) probes still returning EXACTLY the
pre-append pair set (half-visible docs vanish rather than corrupt), and
(3) the documented recovery — re-append the same delta, vacuum —
converging to a consistent index whose probe output is row-identical
to a fresh build over the union.
"""

from __future__ import annotations

import json
import os
import sys
import time

DOCS = "/root/testdata/sf0.001/documents.parquet"
TABLE = "race_idx"
SIDES = ("", "__docs", "__meta")


def _session(root: str, name: str, hive: bool = False):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.warehouse.dir", os.path.join(root, "wh"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName(name)
    )
    if hive:
        # Embedded-derby metastore under <root>: the catalog survives the
        # process, which is what makes the kill-9 arm's RECOVERER able to
        # see the torn tables at all (the default in-memory catalog dies
        # with the corpse).
        b = b.config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={os.path.join(root, 'metastore_db')}"
            ";create=true",
        ).enableHiveSupport()
    return b.getOrCreate()


def _pairs(df) -> list:
    return sorted(
        [int(r["doc_a"]), int(r["doc_b"]), float(r["jac"])] for r in df.collect()
    )


def _wait_for(path: str, timeout: float = 180.0) -> None:
    t0 = time.time()
    while not os.path.exists(path):
        if time.time() - t0 > timeout:
            raise TimeoutError(path)
        time.sleep(0.05)


def appender(root: str) -> None:
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
    )

    spark = _session(root, "idx-race-appender")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    build_minhash_index(
        spark, docs.filter(F.col("doc_id") < 300), table=TABLE, family="md5"
    )
    initial = _pairs(probe_minhash_index(spark, docs, table=TABLE, self_probe=True))
    locations = {}
    for side in SIDES:
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {TABLE}{side}").collect():
            if row[0].strip() == "Location":
                locations[side] = row[1]
    tmp = os.path.join(root, "ready.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"locations": locations, "initial": initial}, fh)
    os.rename(tmp, os.path.join(root, "ready.json"))

    _wait_for(os.path.join(root, "b_started"))
    for i in range(5):
        lo, hi = 300 + 40 * i, 300 + 40 * (i + 1)
        append_minhash_index(
            spark,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            table=TABLE,
        )
        time.sleep(0.2)
    final = _pairs(probe_minhash_index(spark, docs, table=TABLE, self_probe=True))
    tmp = os.path.join(root, "done.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"final": final}, fh)
    os.rename(tmp, os.path.join(root, "done.json"))
    spark.stop()


def prober(root: str) -> None:
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        probe_minhash_index,
    )

    spark = _session(root, "idx-race-prober")
    spark.sparkContext.setLogLevel("ERROR")
    _wait_for(os.path.join(root, "ready.json"))
    with open(os.path.join(root, "ready.json")) as fh:
        locations = json.load(fh)["locations"]
    for side in SIDES:
        # external registration over the appender's managed locations —
        # schema inferred from the files; bucket spec deliberately not
        # claimed (correctness under test, not Exchange-freeness)
        spark.sql(
            f"CREATE TABLE {TABLE}{side} USING PARQUET "
            f"LOCATION '{locations[side]}'"
        )
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    done = os.path.join(root, "done.json")
    observations: list = []
    duplicates = 0
    started = False
    # Own wall-clock deadline (ADVICE r11): if the appender dies between
    # ready.json and done.json, fail promptly with a message naming the
    # dead appender instead of spinning Spark jobs until the parent's
    # communicate() timeout surfaces a generic TimeoutError.
    deadline = time.time() + 300.0
    while True:
        if time.time() > deadline:
            raise RuntimeError(
                "prober deadline exceeded: done.json never appeared — "
                "the appender likely died mid-run; see its stderr"
            )
        was_done = os.path.exists(done)
        for side in SIDES:
            # the catalog caches each table's file listing; a long-lived
            # prober refreshes per pass to see concurrent appends
            spark.catalog.refreshTable(f"{TABLE}{side}")
        rows = probe_minhash_index(
            spark, docs, table=TABLE, self_probe=True
        ).collect()
        keyset = {(r["doc_a"], r["doc_b"]) for r in rows}
        if len(keyset) != len(rows):
            duplicates += 1
        observations.append(
            sorted([int(r["doc_a"]), int(r["doc_b"]), float(r["jac"])] for r in rows)
        )
        if not started:
            started = True
            with open(os.path.join(root, "b_started"), "w") as fh:
                fh.write("1")
        if was_done:  # this probe started after the last append committed
            break
    with open(os.path.join(root, "observations.json"), "w") as fh:
        json.dump({"observations": observations, "duplicates": duplicates}, fh)
    spark.stop()


def torn_appender(root: str) -> None:
    """Kill-9 arm, phase 1: build, record the pre-append truth, then die
    by SIGKILL inside the torn-append window. Everything after the hook
    fires is unreachable — the parent asserts the corpse's returncode."""
    import signal

    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
    )

    spark = _session(root, "idx-torn-appender", hive=True)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    build_minhash_index(
        spark, docs.filter(F.col("doc_id") < 300), table=TABLE, family="md5"
    )
    initial = _pairs(probe_minhash_index(spark, docs, table=TABLE, self_probe=True))
    tmp = os.path.join(root, "ready.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"initial": initial}, fh)
    os.rename(tmp, os.path.join(root, "ready.json"))

    def die() -> None:
        # self-report the phase, then a REAL kill -9: no atexit, no JVM
        # shutdown hooks, no stream flush — the hardest crash there is,
        # delivered deterministically inside the bands→sidecar window
        # (the parent killing "between the writes" from outside would
        # need a sleep to hit this window; the hook needs none)
        with open(os.path.join(root, "phase_bands_committed"), "w") as fh:
            fh.write("1")
            fh.flush()
            os.fsync(fh.fileno())
        os.kill(os.getpid(), signal.SIGKILL)

    append_minhash_index(
        spark,
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 340)),
        table=TABLE,
        after_bands_hook=die,
    )
    raise AssertionError("unreachable: the SIGKILL hook did not fire")


def recoverer(root: str) -> None:
    """Kill-9 arm, phase 2 (fresh process over the derby catalog the
    corpse left): observe the torn state, prove probes stay exact, run
    the documented recovery, prove convergence to a fresh build."""
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        probe_minhash_index,
        vacuum_minhash_index,
        verify_minhash_index,
    )

    spark = _session(root, "idx-recoverer", hive=True)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    report_torn = verify_minhash_index(spark, table=TABLE)
    torn_probe = _pairs(
        probe_minhash_index(spark, docs, table=TABLE, self_probe=True)
    )
    # documented recovery: re-append the SAME delta (band dups are
    # de-duplicated at probe; vacuum removes them), then vacuum
    delta = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 340))
    append_minhash_index(spark, delta, table=TABLE)
    vacuum_minhash_index(spark, table=TABLE)
    report_healed = verify_minhash_index(spark, table=TABLE)
    healed_probe = _pairs(
        probe_minhash_index(spark, docs, table=TABLE, self_probe=True)
    )
    # ground truth: a fresh build over the union must be probe-identical
    build_minhash_index(
        spark, docs.filter(F.col("doc_id") < 340), table="fresh_idx", family="md5"
    )
    fresh_probe = _pairs(
        probe_minhash_index(spark, docs, table="fresh_idx", self_probe=True)
    )
    with open(os.path.join(root, "recovery.json"), "w") as fh:
        json.dump(
            {
                "report_torn": report_torn,
                "torn_probe": torn_probe,
                "report_healed": report_healed,
                "healed_probe": healed_probe,
                "fresh_probe": fresh_probe,
            },
            fh,
        )
    spark.stop()


def vac_appender(root: str) -> None:
    """Vacuum-vs-append fence arm (VERDICT r12 #6), ingest side: build
    the index, then prove BOTH fence directions across a process
    boundary — a REAL append refuses while the other process holds the
    vacuum lock, and a REAL append lock (the primitive every append
    holds) makes the other process's REAL vacuum refuse. Ends with the
    serialized recovery: append + vacuum + verify + probe vs a fresh
    build over the union."""
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        IndexMaintenanceConflict,
        _maintenance_lock,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        append_minhash_index,
        build_minhash_index,
        delete_from_minhash_index,
        probe_minhash_index,
        vacuum_minhash_index,
        verify_minhash_index,
    )

    spark = _session(root, "vac-race-appender")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS).select("doc_id", "text")
    build_minhash_index(
        spark, docs.filter(F.col("doc_id") < 300), table=TABLE, family="md5"
    )
    with open(os.path.join(root, "ready.json.tmp"), "w") as fh:
        json.dump({"ok": True}, fh)
    os.rename(
        os.path.join(root, "ready.json.tmp"), os.path.join(root, "ready.json")
    )
    _wait_for(os.path.join(root, "vac_held"))
    delta = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 340))
    log: dict = {}
    try:
        append_minhash_index(spark, delta, table=TABLE)
        log["append_during_vacuum"] = "SUCCEEDED (fence failed)"
    except IndexMaintenanceConflict as e:
        log["append_during_vacuum"] = f"refused: {e}"
    # r13 third mutator: a REAL takedown must refuse against the held
    # vacuum too — a tombstone written mid-vacuum would be cleared
    # without its rows being dropped (silent resurrection)
    try:
        delete_from_minhash_index(
            spark, docs.filter(F.col("doc_id") == 0).select("doc_id"),
            table=TABLE,
        )
        log["delete_during_vacuum"] = "SUCCEEDED (fence failed)"
    except IndexMaintenanceConflict as e:
        log["delete_during_vacuum"] = f"refused: {e}"
    with open(os.path.join(root, "appends_refused"), "w") as fh:
        fh.write("1")
    _wait_for(os.path.join(root, "vac_released"))
    # now hold BOTH mutator locks (the primitives every append/delete
    # holds) and let the OTHER process attempt a real vacuum — its
    # refusal must come from the shared filesystem alone
    with _maintenance_lock(spark, TABLE, "append"):
        with _maintenance_lock(spark, TABLE, "delete"):
            with open(os.path.join(root, "append_held"), "w") as fh:
                fh.write("1")
            _wait_for(os.path.join(root, "vacuum_refused_done"))
    # serialized aftermath: the refused delta re-applies cleanly, the
    # refused takedown lands, vacuum reclaims it physically, and the
    # result is indistinguishable from a fresh build over the union
    # minus the deleted doc
    append_minhash_index(spark, delta, table=TABLE)
    delete_from_minhash_index(
        spark, docs.filter(F.col("doc_id") == 0).select("doc_id"), table=TABLE
    )
    vacuum_minhash_index(spark, table=TABLE)
    report = verify_minhash_index(spark, table=TABLE)
    deleted_doc_rows = (
        spark.table(TABLE).filter(F.col("doc_id") == 0).count()
        + spark.table(f"{TABLE}__docs").filter(F.col("doc_id") == 0).count()
    )
    healed = _pairs(
        probe_minhash_index(spark, docs, table=TABLE, self_probe=True)
    )
    build_minhash_index(
        spark,
        docs.filter((F.col("doc_id") < 340) & (F.col("doc_id") != 0)),
        table="fresh_idx",
        family="md5",
    )
    fresh = _pairs(
        probe_minhash_index(spark, docs, table="fresh_idx", self_probe=True)
    )
    with open(os.path.join(root, "vac_race_result.json"), "w") as fh:
        json.dump(
            {
                "log": log,
                "consistent": report["consistent"],
                "tombstones_reclaimed": report["tombstoned_doc_ids"] == 0
                and deleted_doc_rows == 0,
                "healed_equals_fresh": healed == fresh,
            },
            fh,
        )
    spark.stop()


def vac_vacuumer(root: str) -> None:
    """Vacuum-vs-append fence arm, maintenance side: a SEPARATE process
    (own in-memory catalog — it cannot even see the appender's tables)
    whose vacuum attempt must be refused purely via the shared
    FILESYSTEM lock, before any catalog access; and whose held vacuum
    lock must make the appender's real append refuse cross-process."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        IndexMaintenanceConflict,
        _maintenance_lock,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        vacuum_minhash_index,
    )

    spark = _session(root, "vac-race-vacuumer")
    spark.sparkContext.setLogLevel("ERROR")
    _wait_for(os.path.join(root, "ready.json"))
    log: dict = {}
    with _maintenance_lock(spark, TABLE, "vacuum"):
        with open(os.path.join(root, "vac_held"), "w") as fh:
            fh.write("1")
        _wait_for(os.path.join(root, "appends_refused"))
    with open(os.path.join(root, "vac_released"), "w") as fh:
        fh.write("1")
    _wait_for(os.path.join(root, "append_held"))
    try:
        vacuum_minhash_index(spark, table=TABLE)
        log["vacuum_during_append"] = "SUCCEEDED (fence failed)"
    except IndexMaintenanceConflict as e:
        log["vacuum_during_append"] = f"refused: {e}"
    with open(os.path.join(root, "vacuumer_log.json"), "w") as fh:
        json.dump(log, fh)
    with open(os.path.join(root, "vacuum_refused_done"), "w") as fh:
        fh.write("1")
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    {
        "appender": appender,
        "prober": prober,
        "torn-appender": torn_appender,
        "recoverer": recoverer,
        "vac-appender": vac_appender,
        "vac-vacuumer": vac_vacuumer,
    }[sys.argv[1]](sys.argv[2])
