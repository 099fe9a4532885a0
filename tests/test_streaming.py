"""Structured Streaming behavior tests: multi-batch triggers, watermark
late-data drops, stateful dedup, stream/batch equivalence, and file-sink
exactly-once restart semantics.

Test data: hand-built event files written as separate parquet files so
``maxFilesPerTrigger=1`` yields deterministic micro-batch sequences with
controlled event-time progress.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.streaming.jobs import (
    dedup_within_watermark,
    read_event_stream,
    run_to_files,
    run_to_memory,
    session_counts,
    tumbling_counts,
)

BASE = pd.Timestamp("2024-01-01 00:00:00")


def _write_batch(spark, directory: str, rows: list[tuple], name: str) -> None:
    """One parquet file of events with int64-nanos ts (mirrors testdata)."""
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts_min", "user_id", "event_type", "value"]
    )
    pdf["ts"] = (
        (BASE + pd.to_timedelta(pdf.pop("ts_min"), unit="m")).astype("int64")
    )
    pdf["props"] = '{"k": 1}'
    pdf = pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.parquet")
    pdf.to_parquet(path, engine="pyarrow", index=False)
    # distinct mtimes => deterministic file-source ordering
    time.sleep(0.05)


def test_late_data_dropped_in_append_mode(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 0: events at minutes 1..5 (window [0,10)) and 12 (window [10,20))
    _write_batch(
        spark, src,
        [(1, 1, 1, "click", 1.0), (2, 5, 1, "click", 1.0), (3, 12, 1, "click", 1.0)],
        "b0",
    )
    # batch 1: watermark pusher at minute 40. The watermark COMPUTED from
    # this batch (30min) only takes EFFECT one batch later (Spark updates
    # the watermark at batch end, from data through the previous batch).
    _write_batch(spark, src, [(4, 40, 1, "click", 1.0)], "b1")
    # batch 2: innocuous event; during it the 30min watermark applies →
    # window [0,10) is evicted and emitted with its 2 on-time events
    _write_batch(spark, src, [(5, 41, 1, "click", 1.0)], "b2")
    # batch 3: the LATE event at minute 2 — its window is closed; dropped
    _write_batch(spark, src, [(6, 2, 1, "click", 99.0)], "b3")
    # batch 4: pusher so any (erroneous) late-event effect would be flushed
    _write_batch(spark, src, [(7, 70, 1, "click", 1.0)], "b4")

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = run_to_memory(
        tumbling_counts(stream, "10 minutes", "10 minutes"),
        "late_drop_sink",
        "append",
    )
    rows = {r.window_start.minute: r for r in out.collect()}
    # window [0,10) closed with ONLY the two on-time events; the late minute-2
    # event (value 99) was dropped, not merged
    assert rows[0].n == 2
    assert rows[0].sum_value == pytest.approx(2.0)


def test_append_vs_complete_and_batch_equivalence(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, i % 25, i % 3, "click", 1.0) for i in range(50)]
    _write_batch(spark, src, rows, "b0")
    stream = read_event_stream(spark, src)
    complete = run_to_memory(
        tumbling_counts(stream), "cmp_complete", "complete"
    ).select("window_start", "event_type", "n", "sum_value")

    batch = (
        spark.read.schema(
            "event_id bigint, ts bigint, user_id bigint, event_type string, "
            "value double, props string"
        )
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    assert sorted(map(tuple, complete.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    # same (user, type) appears 3x within the horizon → 1 survivor
    _write_batch(
        spark, src,
        [(1, 1, 7, "click", 1.0), (2, 2, 7, "click", 1.0), (3, 3, 7, "click", 1.0),
         (4, 1, 8, "view", 1.0)],
        "b0",
    )
    stream = read_event_stream(spark, src)
    out = run_to_memory(
        dedup_within_watermark(stream), "dedup_sink", "append"
    )
    keys = sorted((r.user_id, r.event_type) for r in out.collect())
    assert keys == [(7, "click"), (8, "view")]


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    # user 1: events at 0,3,6 (one session, gaps<5) then 20 (new session);
    # pusher event at minute 60 closes everything
    _write_batch(
        spark, src,
        [(1, 0, 1, "click", 1.0), (2, 3, 1, "click", 1.0), (3, 6, 1, "click", 1.0),
         (4, 20, 1, "click", 1.0), (5, 60, 2, "click", 1.0)],
        "b0",
    )
    stream = read_event_stream(spark, src)
    out = run_to_memory(session_counts(stream), "session_sink", "append")
    u1 = sorted(
        [(r.session_start.minute, r.n_events) for r in out.collect() if r.user_id == 1]
    )
    assert u1 == [(0, 3), (20, 1)]


def test_stateful_user_totals_across_batches(spark, tmp_path):
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import (
        stateful_user_totals,
    )

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, 1, 7, "click", 1.5), (2, 2, 7, "click", 2.5)], "b0")
    _write_batch(spark, src, [(3, 3, 7, "click", 3.0), (4, 4, 9, "view", 1.0)], "b1")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = run_to_memory(stateful_user_totals(stream), "stateful_sink", "update")
    # update mode re-emits per batch; the LAST emission per user is final
    finals = {}
    for r in out.collect():
        finals[r.user_id] = max(finals.get(r.user_id, (0, 0.0)), (r.n, r.total))
    assert finals[7] == (3, 7.0)
    assert finals[9] == (1, 1.0)


def test_file_sink_exactly_once_on_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, 1, 1, "click", 1.0), (2, 2, 2, "view", 2.0)], "b0")

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    run_to_files(stream.select("event_id", "ts", "user_id"), out, ckpt)
    n1 = spark.read.parquet(out).count()

    # restart with NO new input: commit log must prevent re-emission
    stream2 = read_event_stream(spark, src, max_files_per_trigger=1)
    run_to_files(stream2.select("event_id", "ts", "user_id"), out, ckpt)
    assert spark.read.parquet(out).count() == n1 == 2

    # restart with one NEW file: only the delta appears
    _write_batch(spark, src, [(3, 3, 3, "click", 3.0)], "b1")
    stream3 = read_event_stream(spark, src, max_files_per_trigger=1)
    run_to_files(stream3.select("event_id", "ts", "user_id"), out, ckpt)
    ids = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2, 3]


def test_stream_stream_interval_join(spark, tmp_path):
    """Two file-source streams joined on user within a 30-minute horizon:
    the streamed result (append mode, multi-batch) must equal the batch
    interval join of the same data."""
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import interval_join

    views_dir = str(tmp_path / "views")
    buys_dir = str(tmp_path / "buys")
    # views at minutes 0, 10, 50 for user 1; purchases at 20 (pairs with
    # views at 0 and 10... 0 is exactly 20min before: within 30min) and 90
    # (pairs with nothing: 50 is 40min earlier).
    _write_batch(spark, views_dir, [(1, 0, 1, "view", 1.0),
                                    (2, 10, 1, "view", 1.0)], "b0")
    _write_batch(spark, buys_dir, [(100, 20, 1, "purchase", 9.0)], "b0")
    _write_batch(spark, views_dir, [(3, 50, 1, "view", 1.0)], "b1")
    _write_batch(spark, buys_dir, [(101, 90, 1, "purchase", 9.0),
                                   (102, 200, 1, "purchase", 9.0)], "b1")

    joined = interval_join(
        read_event_stream(spark, views_dir),
        read_event_stream(spark, buys_dir),
    )
    streamed = {
        (r.view_id, r.purchase_id)
        for r in run_to_memory(joined, "ssjoin_sink", "append").collect()
    }
    assert streamed == {(1, 100), (2, 100)}

    # batch equivalence over the same files
    def batch_side(d):
        return (
            spark.read.schema(
                "event_id bigint, ts bigint, user_id bigint, "
                "event_type string, value double, props string"
            )
            .parquet(d)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

    batch = {
        (r.view_id, r.purchase_id)
        for r in interval_join(batch_side(views_dir), batch_side(buys_dir)).collect()
    }
    assert batch == streamed


def test_foreach_batch_upsert_last_writer_wins(spark, tmp_path):
    """foreachBatch CDC apply: two one-file micro-batches upsert into a
    parquet target; keys present in both batches must carry the LATER
    batch's values, and the crash-recovery pre-pass must restore a target
    renamed aside mid-swap."""
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import (
        run_foreach_batch_upsert,
    )

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    target = str(tmp_path / "target")
    f1 = os.path.join(indir, "b1.parquet")
    f2 = os.path.join(indir, "b2.parquet")
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(f1)
    pd.DataFrame({"k": [2, 3], "v": ["c", "d"]}).to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 120, now - 120))  # discovery order: f1 then f2
    os.utime(f2, (now - 60, now - 60))

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
    )
    run_foreach_batch_upsert(
        stream, target, str(tmp_path / "ckpt"), key="k"
    )
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "c", 3: "d"}

    # crash simulation: target renamed aside (mid-swap state), then a new
    # batch arrives — the pre-pass must restore __old before upserting
    os.rename(target, target + "__old")
    f3 = os.path.join(indir, "b3.parquet")
    pd.DataFrame({"k": [1, 4], "v": ["z", "e"]}).to_parquet(f3)
    os.utime(f3, (now, now))
    stream2 = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(indir)
    )
    run_foreach_batch_upsert(
        stream2, target, str(tmp_path / "ckpt"), key="k"
    )
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "z", 2: "c", 3: "d", 4: "e"}
    assert not os.path.exists(target + "__old")
    assert not os.path.exists(target + "__new")


def test_transform_with_state_totals(spark, tmp_path):
    """transformWithStateInPandas arm of the custom-stateful operator:
    plan-level always (the TransformWithStateInPySpark node must appear);
    execution + equality with the applyInPandasWithState arm only when the
    protobuf runtime the TWS driver worker needs is installed."""
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import (
        TWS_RUNTIME_AVAILABLE,
        run_to_memory,
        stateful_user_totals_tws,
    )

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, 1, 7, "click", 1.5), (2, 2, 7, "click", 2.5)], "b0")
    _write_batch(spark, src, [(3, 3, 7, "click", 3.0), (4, 4, 9, "view", 1.0)], "b1")
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    out = stateful_user_totals_tws(stream)
    assert "transformWithState" in out._jdf.queryExecution().logical().toString()

    if not TWS_RUNTIME_AVAILABLE:
        import pytest

        pytest.skip("google.protobuf absent: TWS python runner cannot start")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    rows = run_to_memory(out, "tws_sink", "update")
    finals = {}
    for r in rows.collect():
        finals[r.user_id] = max(finals.get(r.user_id, (0, 0.0)), (r.n, r.total))
    assert finals[7] == (3, 7.0)
    assert finals[9] == (1, 1.0)


def test_stream_stream_outer_interval_join_null_timing(spark, tmp_path):
    """Left-outer stream-stream join: the unmatched view's NULL row is held
    back until the watermark closes its join window, then emitted; the
    final streamed set equals the batch left join."""
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import interval_join

    views_dir = str(tmp_path / "views")
    buys_dir = str(tmp_path / "buys")
    # user 1: view@0 converts (purchase@20); view@50 never converts.
    _write_batch(spark, views_dir, [(1, 0, 1, "view", 1.0),
                                    (2, 50, 1, "view", 1.0)], "b0")
    _write_batch(spark, buys_dir, [(100, 20, 1, "purchase", 9.0)], "b0")

    joined = interval_join(
        read_event_stream(spark, views_dir, max_files_per_trigger=1),
        read_event_stream(spark, buys_dir, max_files_per_trigger=1),
        how="left_outer",
    )
    early = {
        (r.view_id, r.purchase_id)
        for r in run_to_memory(joined, "ssjoin_outer_early", "append").collect()
    }
    # watermark (1h) has not passed view@50's window end (50m+30m+60m):
    # only the matched pair is out; the null row is still in state.
    assert early == {(1, 100)}

    # a far-future event on BOTH sides advances both watermarks past every
    # earlier window; the held-back null row must now flush.
    _write_batch(spark, views_dir, [(3, 600, 9, "view", 1.0)], "b1")
    _write_batch(spark, buys_dir, [(101, 600, 9, "purchase", 9.0)], "b1")
    joined2 = interval_join(
        read_event_stream(spark, views_dir, max_files_per_trigger=1),
        read_event_stream(spark, buys_dir, max_files_per_trigger=1),
        how="left_outer",
    )
    late = {
        (r.view_id, r.purchase_id)
        for r in run_to_memory(joined2, "ssjoin_outer_late", "append").collect()
    }
    assert (2, None) in late, late
    assert (1, 100) in late

    def batch_side(d):
        return (
            spark.read.schema(
                "event_id bigint, ts bigint, user_id bigint, "
                "event_type string, value double, props string"
            )
            .parquet(d)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )

    batch = {
        (r.view_id, r.purchase_id)
        for r in interval_join(
            batch_side(views_dir), batch_side(buys_dir), how="left_outer"
        ).collect()
    }
    assert late == batch


def test_available_now_drains_and_resumes(spark, tmp_path):
    """Trigger.AvailableNow: each invocation drains exactly the new input
    then terminates; the checkpoint keeps replays exactly-once."""
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import run_available_now

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, 1, 1, "click", 1.0), (2, 2, 2, "view", 2.0)], "b0")

    run_available_now(
        read_event_stream(spark, src, max_files_per_trigger=1).select(
            "event_id", "ts", "user_id"
        ),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == 2

    # rerun with no new data: terminates immediately, emits nothing
    run_available_now(
        read_event_stream(spark, src, max_files_per_trigger=1).select(
            "event_id", "ts", "user_id"
        ),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == 2

    # new file: only the delta lands
    _write_batch(spark, src, [(3, 3, 3, "click", 3.0)], "b1")
    run_available_now(
        read_event_stream(spark, src, max_files_per_trigger=1).select(
            "event_id", "ts", "user_id"
        ),
        out,
        ckpt,
    )
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]


def test_incremental_matview_equals_batch_aggregate(spark, tmp_path):
    """The merged materialized view must equal the batch aggregate of all
    events after every incremental run, and replays must be no-ops."""
    from wod_ascii_to_parquet_spark_spark.sources.lakehouse import LogTable
    from wod_ascii_to_parquet_spark_spark.streaming.jobs import (
        run_incremental_matview,
    )

    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, 10, 1, "click", 1.0), (2, 70, 1, "view", 2.0)], "b0")

    def run():
        run_incremental_matview(
            read_event_stream(spark, src, max_files_per_trigger=1),
            table_dir,
            ckpt,
        )

    def batch_expected():
        return {
            (str(r.hour), r.event_type, r.n, r.sum_value)
            for r in (
                spark.read.schema(
                    "event_id bigint, ts bigint, user_id bigint, "
                    "event_type string, value double, props string"
                )
                .parquet(src)
                .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                .groupBy(
                    F.date_trunc("hour", F.col("ts")).alias("hour"),
                    "event_type",
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(F.sum("value"), 2).alias("sum_value"),
                )
            ).collect()
        }

    def view_rows():
        return {
            (str(r.hour), r.event_type, r.n, r.sum_value)
            for r in LogTable(spark, table_dir)
            .read()
            .select("hour", "event_type", "n", "sum_value")
            .collect()
        }

    run()
    assert view_rows() == batch_expected()

    # more events for an EXISTING hour + a new hour: merge updates one
    # group in place and inserts the other
    _write_batch(spark, src, [(3, 15, 2, "click", 5.0), (4, 130, 1, "click", 1.0)], "b1")
    run()
    assert view_rows() == batch_expected()

    # idle rerun: no changes, no new version beyond the last
    v = LogTable(spark, table_dir).latest_version()
    run()
    assert LogTable(spark, table_dir).latest_version() == v
    assert view_rows() == batch_expected()
