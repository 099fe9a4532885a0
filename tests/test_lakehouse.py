"""LogTable: the jar-free manifest-log table format — commit atomicity,
snapshot lineage, time travel, isolation, merge, conflicts, vacuum."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
    CommitConflict,
    LogTable,
)


def _local(p: str) -> str:
    """Hadoop returns fully-qualified file: URIs; strip for os.path."""
    return p[len("file:"):] if p.startswith("file:") else p


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v string")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    v0 = t.write(_df(spark, [(1, "a"), (2, "b")]), mode="append")
    v1 = t.write(_df(spark, [(3, "c")]), mode="append")
    v2 = t.write(_df(spark, [(9, "z")]), mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)

    assert {r.k for r in t.read().collect()} == {9}
    assert {r.k for r in t.read(version=1).collect()} == {1, 2, 3}
    assert {r.k for r in t.read(version=0).collect()} == {1, 2}
    # lineage recorded
    assert t.manifest(2)["parent"] == 1 and t.manifest(0)["parent"] is None


def test_snapshot_isolation_across_commit(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    reader = t.read()  # resolves the v0 manifest NOW
    t.write(_df(spark, [(2, "b")]), mode="append")
    # the open reader still sees only v0's files; a fresh reader sees v1
    assert {r.k for r in reader.collect()} == {1}
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_merge_upserts_and_keeps_history(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), mode="append")
    t.merge(_df(spark, [(2, "B2"), (4, "d")]), key="k")
    now = {(r.k, r.v) for r in t.read().collect()}
    assert now == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}
    # pre-merge snapshot still exact
    assert {(r.k, r.v) for r in t.read(version=0).collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }


def test_commit_conflict_refused_and_invisible(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    # a racing writer already committed v1
    stale_files = t.manifest(0)["files"]
    t._commit(stale_files, "append", base=0)
    with pytest.raises(CommitConflict):
        t._commit(stale_files, "append", base=0)
    # a conflicted write() leaves no visible snapshot and cleans staging
    with pytest.raises(CommitConflict):
        LogTableRacy(spark, t.dir).write(_df(spark, [(7, "x")]), "append")
    assert 7 not in {r.k for r in t.read().collect()}


class LogTableRacy(LogTable):
    """Simulates losing the commit race: another writer lands the target
    version between our base read and our commit."""

    def latest_version(self):
        v = super().latest_version()
        return None if v is None else v - 1


def test_vacuum_deletes_only_unreferenced(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    t.write(_df(spark, [(2, "b")]), mode="overwrite")
    old_files = set(t.manifest(0)["files"])
    live_files = set(t.manifest(1)["files"])
    deleted = set(t.vacuum(keep_versions=1, min_age_seconds=0))
    assert deleted == old_files
    assert all(os.path.exists(_local(p)) for p in live_files)
    # latest snapshot unaffected; old manifest gone
    assert {r.k for r in t.read().collect()} == {2}
    assert t.versions() == [1]


def test_crash_before_rename_is_invisible(spark, tmp_path):
    """A fully-written temp manifest that never renamed must not be
    visible as a snapshot, and its files are vacuumable orphans."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    # simulate: data staged, manifest temp written, crash before rename
    staged = _df(spark, [(99, "crash")])
    staging = str(tmp_path / "t" / "data" / "orphan")
    staged.write.parquet(staging)
    assert t.latest_version() == 0  # nothing new visible
    orphans = {
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    }
    deleted = {_local(p) for p in t.vacuum(keep_versions=1, min_age_seconds=0)}
    assert orphans <= deleted
    assert {r.k for r in t.read().collect()} == {1}


def test_works_on_real_table_data(spark, tmp_path):
    from wod_ascii_to_parquet_spark_spark.registry import load

    from .conftest import SF_DIR

    t = LogTable(spark, str(tmp_path / "orders_t"))
    o = load(spark, SF_DIR, "orders")
    t.write(o.filter(F.col("o_orderkey") % 2 == 0), mode="append")
    t.write(o.filter(F.col("o_orderkey") % 2 == 1), mode="append")
    assert t.read().count() == o.count()


def test_stream_to_log_table_exactly_once(spark, tmp_path):
    """foreachBatch → LogTable: one snapshot per micro-batch, batch-id
    replay is a no-op, restarts ingest only the delta."""
    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
        stream_to_log_table,
    )

    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_src(spark, src, [(1, "a"), (2, "b")], "b0")

    def stream():
        return (
            spark.readStream.schema("k bigint, v string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    stream_to_log_table(stream(), table_dir, ckpt)
    t = LogTable(spark, table_dir)
    assert {r.k for r in t.read().collect()} == {1, 2}
    v_after_first = t.latest_version()

    # rerun with no new input: no new snapshot
    stream_to_log_table(stream(), table_dir, ckpt)
    assert LogTable(spark, table_dir).latest_version() == v_after_first

    # new file: exactly one more snapshot with only the delta appended
    _write_src(spark, src, [(3, "c")], "b1")
    stream_to_log_table(stream(), table_dir, ckpt)
    t2 = LogTable(spark, table_dir)
    assert {r.k for r in t2.read().collect()} == {1, 2, 3}
    # a replayed batch committed against a FRESH checkpoint is also a no-op
    stream_to_log_table(stream(), table_dir, str(tmp_path / "ckpt2"))
    assert {r.k for r in LogTable(spark, table_dir).read().collect()} == {1, 2, 3}


def _write_src(spark, directory, rows, name):
    import os as _os

    _os.makedirs(directory, exist_ok=True)
    spark.createDataFrame(rows, "k bigint, v string").coalesce(1).write.mode(
        "append"
    ).parquet(directory)


def test_optimize_compacts_without_changing_rows(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    for i in range(5):  # five snapshots → at least five data files
        t.write(_df(spark, [(i, f"v{i}")]), mode="append")
    before = {(r.k, r.v) for r in t.read().collect()}
    assert len(t.manifest()["files"]) >= 5
    v = t.optimize(target_files=1)
    assert len(t.manifest(v)["files"]) == 1
    assert {(r.k, r.v) for r in t.read().collect()} == before
    # pre-compaction snapshot still time-travelable
    assert {(r.k, r.v) for r in t.read(version=v - 1).collect()} == before
    # vacuum then drops the small files but keeps the compacted layout
    t.vacuum(keep_versions=1, min_age_seconds=0)
    assert {(r.k, r.v) for r in t.read().collect()} == before


def test_merge_lost_update_prevented(spark, tmp_path):
    """Read-modify-write pinning: a commit landing between merge's read
    and its write must conflict, never be silently overwritten."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")

    class SlowMergeTable(LogTable):
        def read(self, version=None):
            df = super().read(version)
            # a concurrent writer lands v1 AFTER our base was pinned
            LogTable(self.spark, self.dir).write(
                _df(spark, [(50, "concurrent")]), mode="append"
            )
            return df

    with pytest.raises(CommitConflict):
        SlowMergeTable(spark, t.dir).merge(_df(spark, [(2, "b")]), key="k")
    # the concurrent writer's row survived
    assert {r.k for r in t.read().collect()} == {1, 50}


def test_vacuum_min_age_spares_inflight_staging(spark, tmp_path):
    """Freshly staged (uncommitted) files are NOT vacuumed under the
    retention guard — an in-flight writer's commit stays publishable."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    staging = str(tmp_path / "t" / "data" / "inflight")
    _df(spark, [(99, "staged")]).write.parquet(staging)
    assert t.vacuum(keep_versions=1) == []  # default min_age: nothing young dies
    staged = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    assert staged  # still there — the in-flight commit can still land


def test_batch_cursor_survives_optimize_and_vacuum(spark, tmp_path):
    """The streaming replay cursor is carried into maintenance commits,
    so optimize+vacuum cannot reopen the duplicate-append window."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append", meta={"batch_id": 7})
    t.optimize(target_files=1)
    t.vacuum(keep_versions=1, min_age_seconds=0)
    assert t.last_committed_batch() == 7


def test_data_skipping_prunes_files_by_manifest_stats(spark, tmp_path):
    """between=(col, lo, hi) drops files whose manifest min/max can't
    intersect the range — before Spark lists a single footer."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(i, "lo") for i in range(0, 10)]).coalesce(1))
    t.write(_df(spark, [(i, "mid") for i in range(100, 110)]).coalesce(1))
    t.write(_df(spark, [(i, "hi") for i in range(1000, 1010)]).coalesce(1))
    all_files = t.manifest()["files"]
    assert len(all_files) == 3
    assert len(t.manifest()["stats"]) == 3  # every file carries stats

    pruned = t.read(between=("k", 100, 150))
    assert len(pruned.inputFiles()) == 1  # only the mid file scanned
    assert {r.k for r in pruned.collect()} == set(range(100, 110))

    # range straddling two files
    two = t.read(between=("k", 5, 105))
    assert len(two.inputFiles()) == 2
    # exact-row filter still applied on top by the caller
    assert two.filter("k BETWEEN 5 AND 105").count() == 11

    # no overlap at all → empty frame, zero data files
    none = t.read(between=("k", 5000, 6000))
    assert none.count() == 0

    # string column stats prune too
    lo_only = t.read(between=("v", "lo", "lo"))
    assert len(lo_only.inputFiles()) == 1


def test_schema_evolution_additive_only(spark, tmp_path):
    """Appends may add columns (old rows read null under mergeSchema);
    dropping a column or changing a type is refused."""
    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
        SchemaMismatch,
    )

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    # additive: new column `w`
    t.write(
        spark.createDataFrame([(2, "b", 9.5)], "k bigint, v string, w double"),
        mode="append",
    )
    rows = {(r.k, r.v, r.w) for r in t.read().collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    assert t.manifest()["schema"] == {
        "k": "bigint",
        "v": "string",
        "w": "double",
    }
    # dropped column refused
    with pytest.raises(SchemaMismatch):
        t.write(spark.createDataFrame([(3,)], "k bigint"), mode="append")
    # changed type refused
    with pytest.raises(SchemaMismatch):
        t.write(
            spark.createDataFrame([("x", "y")], "k string, v string"),
            mode="append",
        )
    # overwrite may rewrite the schema freely
    t.write(spark.createDataFrame([(9,)], "k bigint"), mode="overwrite")
    assert t.manifest()["schema"] == {"k": "bigint"}


def test_merge_and_empty_prune_respect_evolved_schema(spark, tmp_path):
    """merge tolerates updates missing an evolved column, and a fully
    pruned read's empty frame carries the FULL table schema."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    t.write(
        spark.createDataFrame([(2, "b", 1.5)], "k bigint, v string, w double"),
        mode="append",
    )
    # updates lack w: upsert must fill null, not crash
    t.merge(_df(spark, [(1, "A"), (3, "c")]), key="k")
    rows = {(r.k, r.v, r.w) for r in t.read().collect()}
    assert rows == {(1, "A", None), (2, "b", 1.5), (3, "c", None)}
    # empty pruned read still exposes every column
    none = t.read(between=("k", 10_000, 20_000))
    assert none.count() == 0
    assert set(none.columns) == {"k", "v", "w"}


def test_torn_manifest_heals_after_grace(spark, tmp_path, monkeypatch):
    """An aborted commit (version file created, bytes never landed) must
    not brick the table: past the grace period a WRITER deletes the torn
    manifest and the version number becomes committable again. READERS
    never heal — a reader's clock skew vs the store's mtime must not be
    able to delete a manifest whose writer is merely stalled between the
    exclusive create and the payload write."""
    import wod_ascii_to_parquet_spark_spark.sources.lakehouse as LH

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    # simulate the crash: v1 exists with no content
    torn = t._log_path(1)
    os.makedirs(os.path.dirname(_local(torn)), exist_ok=True)
    open(_local(torn), "wb").close()
    monkeypatch.setattr(LH, "_TORN_GRACE_MS", 0)
    # a reader reports the torn state but does NOT delete the manifest
    with pytest.raises(LH.TornManifest):
        t.manifest(1)
    assert t.versions() == [0, 1]
    # the first write attempt heals (deletes the torn v1) and raises for
    # retry; the retry takes the reclaimed slot
    with pytest.raises(LH.TornManifest):
        t.write(_df(spark, [(2, "b")]), mode="append")
    assert t.versions() == [0]
    t.write(_df(spark, [(2, "b")]), mode="append")
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_merge_rejects_duplicate_update_keys(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(_df(spark, [(2, "x"), (2, "y")]), key="k")


def test_vacuum_removes_emptied_staging_dirs(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    t.write(_df(spark, [(2, "b")]), mode="overwrite")
    data_root = tmp_path / "t" / "data"
    assert len(list(data_root.iterdir())) == 2  # two staging dirs
    t.vacuum(keep_versions=1, min_age_seconds=0)
    # the fully reclaimed staging dir (and its _SUCCESS) is gone
    remaining = list(data_root.iterdir())
    assert len(remaining) == 1
    assert {r.k for r in t.read().collect()} == {2}


def test_table_cli_history_optimize_vacuum(spark, tmp_path, capsys):
    """The ops CLI drives history/show/optimize/vacuum end-to-end and
    emits one JSON document per invocation."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    t.write(_df(spark, [(2, "b")]), mode="append")
    d = str(tmp_path / "t")

    assert table_cli.main(["history", d]) == 0
    hist = _json.loads(capsys.readouterr().out.strip())
    assert [h["version"] for h in hist["history"]] == [0, 1]

    assert table_cli.main(["show", d]) == 0
    shown = _json.loads(capsys.readouterr().out.strip())
    assert shown["rows"] == 2 and shown["schema"]["k"] == "bigint"

    assert table_cli.main(["optimize", d, "--target-files", "1"]) == 0
    opt = _json.loads(capsys.readouterr().out.strip())
    assert opt["n_files"] == 1

    assert table_cli.main(["vacuum", d, "--keep", "1", "--min-age-hours", "0"]) == 0
    vac = _json.loads(capsys.readouterr().out.strip())
    assert vac["deleted_files"] >= 2 and vac["kept_versions"] == [2]
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_table_cli_update_where(spark, tmp_path, capsys):
    """The update-where verb parses repeatable COL=EXPR assignments,
    applies them copy-on-write, and rejects malformed/duplicate --set
    args with exit 2 before touching the table."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    d = str(tmp_path / "t")

    assert table_cli.main(
        ["update-where", d, "--predicate", "k >= 10",
         "--set", "v=upper(v)", "--set", "k=k + length(v)"]
    ) == 0
    rep = _json.loads(capsys.readouterr().out.strip())
    assert rep["rows_updated"] == 1
    # simultaneous assignment: k used OLD v ('x', length 1)
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, "a"), (11, "X")}

    v = t.latest_version()
    assert table_cli.main(
        ["update-where", d, "--predicate", "k = 1", "--set", "nonsense"]
    ) == 2
    assert "bad --set" in capsys.readouterr().out
    assert table_cli.main(
        ["update-where", d, "--predicate", "k = 1",
         "--set", "v=upper(v)", "--set", "v=lower(v)"]
    ) == 2
    assert "duplicate" in capsys.readouterr().out
    assert t.latest_version() == v  # refusals committed nothing


def test_table_cli_invocations_leave_cache_empty(spark, tmp_path, monkeypatch):
    """VERDICT r9 #4: the ops CLI is a long-lived entry point (one session
    reused across N in-process invocations), so main() must scope each
    invocation with cached_frames(): a table op that persist()s — none do
    today, simulated here by patching LogTable.read to persist its frame —
    must not accumulate one CacheManager entry per invocation."""
    from wod_ascii_to_parquet_spark_spark import table_cli

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    d = str(tmp_path / "t")

    real_read = LogTable.read

    def persisting_read(self, *a, **k):
        df = real_read(self, *a, **k).persist()
        df.count()
        return df

    monkeypatch.setattr(LogTable, "read", persisting_read)
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    for _ in range(4):
        assert table_cli.main(["show", d]) == 0
        assert cm.isEmpty(), "CLI invocation leaked a persisted frame"


def test_segment_spill_and_checkpoint(spark, tmp_path, monkeypatch):
    """Once the inherited inline file list reaches the spill threshold,
    appends move it into immutable ``seg-*.json`` segments (per-commit
    manifest write stays O(batch)); reaching the checkpoint threshold
    merges the segments back into one. Reads and time travel stay exact
    throughout."""
    import wod_ascii_to_parquet_spark_spark.sources.lakehouse as LH

    monkeypatch.setattr(LH, "_SEGMENT_SPILL_FILES", 2)
    monkeypatch.setattr(LH, "_CHECKPOINT_SEGMENTS", 3)
    t = LogTable(spark, str(tmp_path / "t"))
    for i in range(8):
        t.write(_df(spark, [(i, f"v{i}")]).coalesce(1), mode="append")
    # every snapshot remains exact under segmentation
    for v in range(8):
        assert {r.k for r in t.read(version=v).collect()} == set(range(v + 1))
    latest = t.manifest()
    # inline tail bounded by the spill threshold + one batch
    assert len(latest["files"]) <= 3
    # checkpointing bounded the segment count
    assert 1 <= len(latest.get("segments", [])) < 3
    files, stats = t.resolve_files(latest)
    assert len(files) == 8 and len(set(files)) == 8
    # data-skipping stats survive the segment round-trip
    assert len(stats) == 8
    pruned = t.read(between=("k", 6, 7))
    assert {r.k for r in pruned.collect()} >= {6, 7}


def test_segment_vacuum_reclaims_orphans_and_respects_live(spark, tmp_path, monkeypatch):
    import wod_ascii_to_parquet_spark_spark.sources.lakehouse as LH

    monkeypatch.setattr(LH, "_SEGMENT_SPILL_FILES", 1)
    monkeypatch.setattr(LH, "_CHECKPOINT_SEGMENTS", 100)
    t = LogTable(spark, str(tmp_path / "t"))
    for i in range(5):
        t.write(_df(spark, [(i, "x")]).coalesce(1), mode="append")
    log_dir = tmp_path / "t" / "_log"
    assert len(list(log_dir.glob("seg-*.json"))) >= 4
    # an overwrite drops every segment from the live snapshot
    t.write(_df(spark, [(99, "z")]), mode="overwrite")
    t.vacuum(keep_versions=1, min_age_seconds=0)
    assert list(log_dir.glob("seg-*.json")) == []
    assert {r.k for r in t.read().collect()} == {99}


def test_vacuumed_manifest_read_raises_clean_retryable(spark, tmp_path):
    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
        SnapshotVacuumed,
    )

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    t.write(_df(spark, [(2, "b")]), mode="append")
    t.vacuum(keep_versions=1, min_age_seconds=0)
    # a reader that resolved v0 before the vacuum gets the clean
    # retryable signal, not a raw connector stack trace
    with pytest.raises(SnapshotVacuumed):
        t.manifest(0)


def test_commit_detects_lost_update(spark, tmp_path, monkeypatch):
    """If the winning manifest's payload is not OURS at post-commit
    verification (exotic-FS non-atomic create, or healing deleted the
    file mid-commit), the commit must conflict — never return a version
    number that holds someone else's (or no) snapshot."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")

    real_create = t.fs.create_exclusive

    def lying_create(path, data):
        # simulate a non-atomic create losing silently: another writer's
        # payload lands, but our create still reports success
        real_create(path, b'{"other": "writer"}')
        return True

    monkeypatch.setattr(t.fs, "create_exclusive", lying_create)
    with pytest.raises(CommitConflict, match="another writer"):
        t.write(_df(spark, [(2, "b")]), mode="append")


def test_staging_reclaimed_by_concurrent_vacuum_aborts_commit(
    spark, tmp_path, monkeypatch
):
    """A write whose staged files a concurrent vacuum deleted must abort
    retryably instead of publishing a manifest that references deleted
    files (a permanently unreadable latest snapshot)."""
    import shutil

    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
        StagingReclaimed,
    )

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")

    real_minmax = None
    import wod_ascii_to_parquet_spark_spark.sources.lakehouse as LH

    real_minmax = LH._footer_minmax

    def minmax_then_reclaim(path):
        # simulate the vacuum racing in AFTER staging, BEFORE commit
        out = real_minmax(path)
        local = _local(path)
        if os.path.exists(local):
            os.remove(local)
        return out

    monkeypatch.setattr(LH, "_footer_minmax", minmax_then_reclaim)
    with pytest.raises(StagingReclaimed):
        t.write(_df(spark, [(2, "b")]).coalesce(1), mode="append")
    # the table is unharmed: latest snapshot still readable
    assert {r.k for r in t.read().collect()} == {1}


def test_create_exclusive_is_kernel_atomic_for_local(spark, tmp_path):
    """Local-path exclusivity must come from O_CREAT|O_EXCL (atomic
    across PROCESSES), not Hadoop's exists-check-then-create."""
    from wod_ascii_to_parquet_spark_spark.sources.filesystem import FsClient

    fs = FsClient(spark)
    target = str(tmp_path / "x.json")
    assert fs.create_exclusive(target, b"one") is True
    assert fs.create_exclusive(target, b"two") is False
    with open(target, "rb") as fh:
        assert fh.read() == b"one"  # the loser must not truncate the winner


def _race_worker(args):
    """One OS process trying the exclusive create (module-level for
    pickling). No Spark in the worker: the local arm of create_exclusive
    is pure os.open(O_CREAT|O_EXCL) and never touches the JVM, so the
    instance is built uninitialised — exactly the code path a second
    writer PROCESS (scheduled table_cli vacuum vs streaming ingest, the
    multi-writer deployment the module advertises) would execute."""
    target, payload, barrier = args
    from wod_ascii_to_parquet_spark_spark.sources.filesystem import FsClient

    fs = FsClient.__new__(FsClient)
    barrier.wait(timeout=30)  # maximize simultaneity
    return payload, fs.create_exclusive(target, payload.encode())


def test_create_exclusive_multiprocess_race_single_winner(tmp_path):
    """TRUE cross-process commit race: N processes hit the same manifest
    path simultaneously; exactly one must win and the landed payload must
    be the winner's, bytes intact (the pre-O_EXCL failure mode was both
    writers passing Hadoop's exists-check and the loser truncating the
    winner — a silent lost update)."""
    import multiprocessing as mp

    n = 8
    target = str(tmp_path / "v0001.json")
    ctx = mp.get_context("fork")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(n)
        with ctx.Pool(n) as pool:
            results = pool.map(
                _race_worker, [(target, f"writer-{i}", barrier) for i in range(n)]
            )
    winners = [payload for payload, won in results if won]
    assert len(winners) == 1, results
    with open(target) as fh:
        assert fh.read() == winners[0]


class _PutOnClose:
    """An output stream whose bytes land only at close() — truthful to
    S3: the object materializes when the PUT completes, not per write."""

    def __init__(self, key: str):
        self._key, self._buf = key, bytearray()

    def write(self, data):
        self._buf += data

    def close(self):
        with open(self._key, "wb") as fh:  # unconditional PUT: replaces
            fh.write(self._buf)


class _PlainS3Fs:
    """The Hadoop-FileSystem surface the plain-create arm touches, with
    object-store-without-conditional-writes semantics: create(path,
    overwrite=false) is HEAD (exists check) then, after a deliberate
    scheduling window, an UNCONDITIONAL PUT at close — so every racer
    that passes HEAD before anyone PUTs "succeeds" and the last PUT
    silently replaces the rest. This is the s3a degradation
    create_exclusive's docstring warns about, made maximally racy."""

    def __init__(self, window_sec: float):
        self._window = window_sec

    def create(self, key: str, overwrite: bool):
        assert overwrite is False
        if os.path.exists(key):  # the HEAD
            raise FileExistsError(key)
        import time

        time.sleep(self._window)  # check-to-PUT window
        return _PutOnClose(key)

    def exists(self, key: str) -> bool:
        return os.path.exists(key)


class _S3SemanticsFs:
    """FsClient over an in-process S3 behavioral model (no JVM): the
    create_exclusive logic under test is the REAL FsClient method
    (inherited below) — only the two storage primitives are modeled:

    - plain ``create(overwrite=false)`` → :class:`_PlainS3Fs` —
      deliberately NON-atomic (HEAD-then-PUT),
    - ``_conditional_create`` → kernel ``O_EXCL``, standing in for the
      server-arbitrated ``If-None-Match: *`` PUT (same atomicity
      contract: exactly one creator, loser sees the conflict).

    ``conditional=False`` models a legacy connector: the probe raises
    ConditionalCreateUnsupported and the racy plain arm is all there is."""

    def __init__(self, root: str, conditional: bool, window_sec: float = 0.2):
        self._root = root
        self._conditional = conditional
        self._window = window_sec
        self._cond_create_support: dict[str, bool] = {}

    def _key(self, path: str) -> str:
        assert path.startswith("mock://bucket/")
        return os.path.join(self._root, path[len("mock://bucket/"):])

    def _fs_path(self, path: str):
        return _PlainS3Fs(self._window), self._key(path)

    def _conditional_create(self, path: str, data: bytes) -> bool:
        from wod_ascii_to_parquet_spark_spark.sources.filesystem import (
            ConditionalCreateUnsupported,
        )

        if not self._conditional:
            raise ConditionalCreateUnsupported(path)
        try:
            fd = os.open(
                self._key(path), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        return True

    # the real method under test
    def create_exclusive(self, path: str, data: bytes) -> bool:
        from wod_ascii_to_parquet_spark_spark.sources.filesystem import FsClient

        return FsClient.create_exclusive(self, path, data)


def _s3_race_worker(args):
    root, payload, conditional, barrier = args
    store = _S3SemanticsFs(root, conditional=conditional)
    barrier.wait(timeout=30)
    return payload, store.create_exclusive(
        "mock://bucket/v0001.json", payload.encode()
    )


def _run_s3_race(tmp_path, conditional: bool, n: int = 8):
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    with ctx.Manager() as mgr:
        barrier = mgr.Barrier(n)
        with ctx.Pool(n) as pool:
            results = pool.map(
                _s3_race_worker,
                [
                    (str(tmp_path), f"writer-{i}", conditional, barrier)
                    for i in range(n)
                ],
            )
    return results


def test_commit_race_on_nonatomic_store_single_winner(tmp_path):
    """VERDICT r7 #2 'done' criterion: the 8-process commit race stays
    single-winner over a store whose ``create(overwrite=false)`` is
    DELIBERATELY non-atomic — because create_exclusive engages the
    conditional-create arm first, never the racy plain create. A
    regression that reordered the arms (or dropped the conditional
    attempt) makes every racer win via HEAD-then-PUT and this fails."""
    results = _run_s3_race(tmp_path, conditional=True)
    winners = [payload for payload, won in results if won]
    assert len(winners) == 1, results
    with open(tmp_path / "v0001.json") as fh:
        assert fh.read() == winners[0]


def test_nonatomic_plain_create_is_actually_racy(tmp_path):
    """Power check for the test above: on the SAME store with the
    conditional capability absent (legacy connector), the plain
    HEAD-then-PUT arm lets multiple racers 'win' — proving the
    single-winner assertion genuinely depends on the conditional arm,
    not on the model being accidentally atomic. (This lost update is
    what lakehouse._commit's post-commit payload verification then
    catches: every writer re-reads, and only the one whose bytes landed
    reports success — asserted in
    test_lost_update_caught_by_payload_verification.)"""
    results = _run_s3_race(tmp_path, conditional=False)
    winners = [payload for payload, won in results if won]
    assert len(winners) >= 2, results


def test_lost_update_caught_by_payload_verification(spark, tmp_path, monkeypatch):
    """Tier-3 protocol (rename-less store, no conditional writes): two
    writers both pass the non-atomic create; the one whose payload was
    replaced must report CommitConflict from the post-commit read-back,
    and the survivor's manifest must be intact."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")

    real = t.fs.create_exclusive

    def lossy_create(path, data):
        won = real(path, data)
        if won and path.endswith("v1.json"):
            # another writer's unconditional PUT lands right after ours
            with open(_local(path), "wb") as fh:
                fh.write(b'{"intruder": true}')
        return won

    monkeypatch.setattr(t.fs, "create_exclusive", lossy_create)
    with pytest.raises(CommitConflict, match="another writer"):
        t.write(_df(spark, [(2, "b")]), mode="append")
    # the surviving manifest is the intruder's, untouched by the loser
    assert t.fs.read_bytes(t._log_path(1)) == b'{"intruder": true}'


def test_hundred_commit_log_stays_bounded(spark, tmp_path, monkeypatch):
    """VERDICT r6 #6 'done' criterion: 100+ commits with segment spill and
    checkpoint merges active — per-commit manifest writes stay O(batch),
    segment count stays below the checkpoint threshold, and reads (latest
    + sampled time travel) remain exact throughout the log's life."""
    import json as _json

    import wod_ascii_to_parquet_spark_spark.sources.lakehouse as LH

    monkeypatch.setattr(LH, "_SEGMENT_SPILL_FILES", 6)
    monkeypatch.setattr(LH, "_CHECKPOINT_SEGMENTS", 4)
    t = LogTable(spark, str(tmp_path / "t"))
    n = 110
    # one-row single-file commits: the log machinery (not Spark write
    # throughput) is what this exercises
    for i in range(n):
        t.write(_df(spark, [(i, f"v{i}")]).coalesce(1), mode="append")

    latest = t.manifest()
    # inline tail bounded by spill threshold + one batch, NOT by history
    assert len(latest["files"]) <= 7, len(latest["files"])
    # checkpoint merges keep the segment count bounded
    assert len(latest.get("segments", [])) <= 4, latest.get("segments")
    # every file still reachable, exactly once
    files, stats = t.resolve_files(latest)
    assert len(files) == n and len(set(files)) == n
    assert len(stats) == n
    # the manifest document itself stays O(batch + segments), far below
    # one entry per historical file
    raw = (tmp_path / "t" / "_log").glob("v*.json")
    sizes = {p.name: len(p.read_bytes()) for p in raw}
    worst = max(sizes.values())
    one_file_doc = len(_json.dumps(latest["files"][:1]))
    assert worst < n * one_file_doc / 2, (worst, one_file_doc)
    # reads stay exact: latest + sampled time travel across the log
    assert {r.k for r in t.read().collect()} == set(range(n))
    for v in (0, 1, 17, 63, n - 2):
        assert {r.k for r in t.read(version=v).collect()} == set(range(v + 1))
    # data skipping still prunes from manifest metadata alone
    pruned = t.read(between=("k", 100, 104))
    assert {r.k for r in pruned.collect()} >= set(range(100, 105))


class _RecordingBuilder:
    """createFile() builder stub that records the must()-option calls —
    pins the HADOOP-19256 option POLARITY: the value must be TRUE to
    request the server-side If-None-Match PUT; a False would be accepted
    by a connector that knows the key and silently run the racy
    HEAD-then-PUT path (a bug this suite once shipped)."""

    def __init__(self, sink: dict):
        self._sink = sink

    def overwrite(self, flag):
        self._sink["overwrite"] = flag
        return self

    def must(self, key, value):
        self._sink.setdefault("must", {})[key] = value
        return self

    def build(self):
        class _Stream:
            def write(self, data):
                pass

            def close(self):
                pass

        self._sink["built"] = True
        return _Stream()


def test_conditional_create_requests_true_polarity(monkeypatch):
    """_conditional_create must pass must(fs.option.create.conditional.
    overwrite, True) — True ENABLES the conditional PUT; False is still a
    valid build on a conditional-capable store but degrades it to the
    client-side check this arm exists to avoid."""
    from wod_ascii_to_parquet_spark_spark.sources import filesystem as FS

    recorded: dict = {}

    class _Fs:
        def createFile(self, p):
            return _RecordingBuilder(recorded)

        def getUri(self):
            class _U:
                def toString(self):
                    return "mock://bucket"

            return _U()

    client = FS.FsClient.__new__(FS.FsClient)
    client._cond_create_support = {}
    monkeypatch.setattr(
        FS.FsClient, "_fs_path", lambda self, path: (_Fs(), path)
    )
    assert client._conditional_create("mock://bucket/v0.json", b"{}") is True
    assert recorded["overwrite"] is False
    assert recorded["must"] == {FS._CONDITIONAL_CREATE_OPT: True}
    assert client._cond_create_support["mock://bucket"] is True


def test_unknown_builder_option_match_is_narrow():
    """_is_unknown_builder_option must not misclassify arbitrary failures
    whose str() merely MENTIONS UnsupportedOperationException or the
    option key (a Py4JJavaError's str carries the whole Java stack
    trace) — a false positive permanently disables the conditional arm
    for the session."""
    from wod_ascii_to_parquet_spark_spark.sources import filesystem as FS

    # spec-mandated rejection message: matched
    assert FS._is_unknown_builder_option(
        Exception("java.lang.IllegalArgumentException: Unknown mandatory key "
                  f"\"{FS._CONDITIONAL_CREATE_OPT}\"")
    )
    # transient failure whose trace mentions the class name: NOT matched
    assert not FS._is_unknown_builder_option(
        Exception("connection reset\nCaused by: "
                  "java.lang.UnsupportedOperationException: other thing")
    )
    # config dump echoing the option key: NOT matched
    assert not FS._is_unknown_builder_option(
        Exception(f"timeout while applying {FS._CONDITIONAL_CREATE_OPT}")
    )

    class _JExc:
        def __init__(self, cls, msg):
            self._cls, self._msg = cls, msg

        def getClass(self):
            outer = self

            class _C:
                def getName(self):
                    return outer._cls

            return _C()

        def getMessage(self):
            return self._msg

    class _Py4JStyle(Exception):
        def __init__(self, jexc):
            super().__init__("py4j wrapper")
            self.java_exception = jexc

    # top-level UnsupportedOperationException naming the option: matched
    assert FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.lang.UnsupportedOperationException",
                         f"unsupported: {FS._CONDITIONAL_CREATE_OPT}"))
    )
    # bare top-level UOE with no key in the message: ALSO matched — the
    # call site is scoped to the createFile() builder chain, and
    # connectors may reject it with e.g. "createFile options not
    # supported" that never names the key; requiring the key here made
    # the commit hard-fail instead of falling back (r8 ADVICE).
    assert FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.lang.UnsupportedOperationException",
                         "createFile options not supported"))
    )
    assert FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.lang.UnsupportedOperationException", None))
    )
    # IllegalArgumentException still requires the key — IAE is also how
    # unrelated bad arguments surface
    assert FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.lang.IllegalArgumentException",
                         f"Unknown mandatory key \"{FS._CONDITIONAL_CREATE_OPT}\""))
    )
    assert not FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.lang.IllegalArgumentException",
                         "Wrong FS scheme"))
    )
    # non-UOE/IAE top-level classes: never matched
    assert not FS._is_unknown_builder_option(
        _Py4JStyle(_JExc("java.io.IOException",
                         f"while applying {FS._CONDITIONAL_CREATE_OPT}"))
    )


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    """COW DELETE (r13): only files containing victims are rewritten —
    untouched files carry into the new snapshot BY REFERENCE (same
    physical paths), the pre-delete snapshot stays time-travelable, and
    the row set is exactly the predicate complement."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="append")     # file A
    t.write(_df(spark, [(10, "x"), (11, "y")]), mode="append")   # file B
    t.write(_df(spark, [(20, "p"), (21, "q")]), mode="append")   # file C
    before_files, _ = t.resolve_files(t.manifest())
    rep = t.delete_where("k >= 10 AND k < 20")
    assert rep["rows_deleted"] == 2
    assert rep["files_rewritten"] >= 1
    assert rep["files_untouched"] >= 1
    after_files, _ = t.resolve_files(t.manifest())
    # files A and C (no victims) carried by reference — identical paths
    untouched_before = [
        p for p in before_files if p in after_files
    ]
    assert len(untouched_before) == rep["files_untouched"]
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (20, "p"), (21, "q")
    }
    # time travel to the pre-delete snapshot is intact
    assert {r.k for r in t.read(version=rep["version"] - 1).collect()} == {
        1, 2, 10, 11, 20, 21
    }


def test_update_where_rewrites_only_touched_files(spark, tmp_path):
    """COW UPDATE (r14): only files containing matches are rewritten,
    untouched files carry by reference, row COUNT is preserved, matched
    rows get the SET expressions, and the pre-update snapshot stays
    time-travelable."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="append")     # file A
    t.write(_df(spark, [(10, "x"), (11, "y")]), mode="append")   # file B
    before_files, _ = t.resolve_files(t.manifest())
    rep = t.update_where("k >= 10", {"v": "upper(v)", "k": "k + 100"})
    assert rep["rows_updated"] == 2
    assert rep["files_rewritten"] >= 1
    assert rep["files_untouched"] >= 1
    after_files, _ = t.resolve_files(t.manifest())
    # exactly the untouched files carried by reference (same paths)
    assert (
        len([p for p in before_files if p in after_files])
        == rep["files_untouched"]
    )
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, "b"), (110, "X"), (111, "Y")
    }
    assert {(r.k, r.v) for r in t.read(version=rep["version"] - 1).collect()} == {
        (1, "a"), (2, "b"), (10, "x"), (11, "y")
    }


def test_update_where_simultaneous_assignment_swaps(spark, tmp_path):
    """SQL UPDATE evaluates every SET expression against the PRE-update
    row: SET k = length(v), v = cast(k as string) must not chain."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(7, "abc")]), mode="append")
    t.update_where("k = 7", {"k": "length(v)", "v": "cast(k as string)"})
    assert [(r.k, r.v) for r in t.read().collect()] == [(3, "7")]


def test_update_where_null_predicate_rows_unchanged(spark, tmp_path):
    """Three-valued logic: a NULL predicate never updates."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "zz")], "k bigint, v string"
        ),
        mode="append",
    )
    rep = t.update_where("length(v) > 1", {"k": "k + 10"})
    assert rep["rows_updated"] == 1
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (2, None), (13, "zz")
    }


def test_update_where_set_on_evolved_column_pre_evolution_file(
    spark, tmp_path
):
    """ADVICE r14 regression: SET on a column added by additive schema
    evolution must land even when EVERY matched file predates the
    column. File A (k, v) is written before column ``w`` exists; the
    update's predicate matches only file-A rows, so the rewritten
    subset has no ``w`` — the old df.columns-driven projection silently
    dropped the assignment while still reporting rows_updated."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (2, "b")]), mode="append")  # pre-w
    t.write(
        spark.createDataFrame(
            [(10, "x", "W10")], "k bigint, v string, w string"
        ),
        mode="append",
    )  # adds column w
    rep = t.update_where("k = 1", {"w": "'SET-W'", "v": "upper(v)"})
    assert rep["rows_updated"] == 1
    got = {(r.k, r.v, r.w) for r in t.read().collect()}
    assert got == {
        (1, "A", "SET-W"),   # evolved column materialized AND set
        (2, "b", None),      # unmatched row in same file: w stays NULL
        (10, "x", "W10"),    # untouched post-evolution file unchanged
    }


def test_update_where_refuses_unknown_set_column(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    v = t.latest_version()
    with pytest.raises(ValueError, match="do not exist"):
        t.update_where("k = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="at least one SET"):
        t.update_where("k = 1", {})
    assert t.latest_version() == v  # nothing committed


def test_update_where_no_match_commits_nothing(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    v = t.latest_version()
    rep = t.update_where("k > 100", {"v": "upper(v)"})
    assert rep["rows_updated"] == 0 and rep["version"] == v
    assert t.latest_version() == v


def test_update_where_conflicts_with_concurrent_commit(spark, tmp_path):
    """update_where pins its commit to the snapshot it read: a commit
    that lands in between must surface as CommitConflict, never a
    silent lost update."""
    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import (
        CommitConflict,
    )

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    orig_commit = t._commit

    def racing_commit(files, mode, base, **kw):
        if kw.get("meta", {}).get("update_where") and not getattr(
            racing_commit, "raced", False
        ):
            racing_commit.raced = True
            t2 = LogTable(spark, str(tmp_path / "t"))
            t2.write(_df(spark, [(99, "z")]), mode="append")
        return orig_commit(files, mode, base, **kw)

    t._commit = racing_commit
    try:
        with pytest.raises(CommitConflict):
            t.update_where("k >= 10", {"v": "upper(v)"})
    finally:
        t._commit = orig_commit
    # the racing append won; its row is intact and nothing was updated
    assert {(r.k, r.v) for r in t.read().collect()} == {
        (1, "a"), (10, "x"), (99, "z")
    }


def test_delete_where_table_dir_with_space(spark, tmp_path):
    """input_file_name returns PERCENT-ENCODED URIs; a table directory
    containing a space must still map scanned files back to manifest
    paths (ADVICE r13: raw basename lookup KeyError'd mid-delete)."""
    t = LogTable(spark, str(tmp_path / "dir with space" / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    rep = t.delete_where("k >= 10")
    assert rep["rows_deleted"] == 1
    assert {r.k for r in t.read().collect()} == {1}


def test_delete_where_no_match_commits_nothing(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a")]), mode="append")
    v = t.latest_version()
    rep = t.delete_where("k > 100")
    assert rep["rows_deleted"] == 0 and rep["version"] == v
    assert t.latest_version() == v


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL three-valued logic: DELETE removes rows where the predicate
    is TRUE — a NULL predicate must never delete (the conservative
    direction for a destructive op)."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame(
            [(1, "a"), (2, None), (3, "zz")], "k bigint, v string"
        ),
        mode="append",
    )
    rep = t.delete_where("length(v) > 1")  # NULL for k=2
    assert rep["rows_deleted"] == 1
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_delete_where_conflicts_with_concurrent_commit(spark, tmp_path):
    """The delete is pinned to the version it READ: a commit landing
    between read and publish must conflict, never be silently
    overwritten (same read-modify-write contract as merge)."""
    from wod_ascii_to_parquet_spark_spark.sources import lakehouse as lh

    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    orig = lh.LogTable._commit

    def racing_commit(self, files, mode, base, **kw):
        # sneak a concurrent append in first, once
        if kw.get("meta", {}).get("delete_where") and not getattr(
            self, "_raced", False
        ):
            self._raced = True
            t2 = LogTable(spark, self.dir)
            t2.write(_df(spark, [(99, "zz")]), mode="append")
        return orig(self, files, mode, base, **kw)

    lh.LogTable._commit = racing_commit
    try:
        with pytest.raises(CommitConflict):
            t.delete_where("k >= 10")
    finally:
        lh.LogTable._commit = orig
    # the loser's snapshot never became visible; the append won
    assert {r.k for r in t.read().collect()} == {1, 10, 99}


def test_delete_where_then_vacuum_reclaims_replaced_files(spark, tmp_path):
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    before_files, _ = t.resolve_files(t.manifest())
    rep = t.delete_where("k >= 10")
    assert rep["rows_deleted"] == 1
    deleted = t.vacuum(keep_versions=1, min_age_seconds=0.0)
    # the replaced (pre-delete) file is physically reclaimed
    replaced = [p for p in before_files if p not in
                t.resolve_files(t.manifest())[0]]
    assert replaced and all(p in deleted for p in replaced)
    assert {r.k for r in t.read().collect()} == {1}


def test_delete_where_preserves_evolved_columns(spark, tmp_path):
    """Review r13: the snapshot can span files with and without a
    later-added column (additive evolution); the COW rewrite must merge
    schemas so surviving rows keep the newer column instead of silently
    NULLing it out of the rewritten files."""
    t = LogTable(spark, str(tmp_path / "t"))
    t.write(_df(spark, [(1, "a"), (10, "x")]), mode="append")
    t.write(
        spark.createDataFrame(
            [(20, "p", 7.5), (30, "q", 8.5)], "k bigint, v string, w double"
        ),
        mode="append",
    )
    rep = t.delete_where("k = 20")
    assert rep["rows_deleted"] == 1
    rows = {(r.k, r.v, r.w) for r in t.read().collect()}
    # k=30 survived the rewrite WITH its evolved column intact
    assert (30, "q", 8.5) in rows
    assert {r[0] for r in rows} == {1, 10, 30}
