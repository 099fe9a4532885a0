"""Reusable Structured Streaming jobs over event-shaped data (SURVEY §2.10).

The reference is batch-only; its incremental unit is the FILE, resumed via
``_SUCCESS`` markers (``DatasetYearTrain.java:89-94``). These jobs are the
streaming generalization: the file-source + checkpoint + sink-commit-log
triple gives exactly-once over growing directories — the same contract the
reference enforces by hand, managed by the engine.

State-size discipline (the 100 TB/day concern):
- every aggregation is windowed AND watermarked → state is bounded by
  (keys × windows inside the watermark horizon);
- ``dropDuplicatesWithinWatermark`` bounds the dedup key set the same way;
- sinks are idempotent (file sink commit log / foreachBatch with batchId).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
    path_glob: str | None = None,
) -> DataFrame:
    """File-source event stream with a microsecond ``ts`` timestamp.
    ``max_files_per_trigger=1`` gives deterministic one-file micro-batches
    for tests.

    Spark builds differ in how the parquet reader surfaces
    TIMESTAMP(NANOS): older vectorized readers reject it unless
    ``nanosAsLong`` maps it to raw int64 nanos; newer ones read it
    natively as ``timestamp_ntz`` truncated to micros and IGNORE that
    conf. A hardcoded ``ts bigint`` stream schema silently mis-scales on
    the latter (the reader hands back micros, the pipeline divides by
    1000 again). So: probe the BATCH reader's view of the files — one
    footer read — and mirror whatever it reports in the stream schema,
    converting to a microsecond timestamp either way; parity with
    ``registry.load`` holds on both reader generations."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read
    if path_glob:
        probe = probe.option("pathGlobFilter", path_glob)
    raw_ts = dict(probe.parquet(directory).dtypes).get("ts", "timestamp")
    if raw_ts == "bigint":  # nanosAsLong honored: raw int64 nanos
        schema = EVENTS_RAW_SCHEMA
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:  # native read: already a (µs-truncated) timestamp flavor
        schema = EVENTS_RAW_SCHEMA.replace("ts bigint", f"ts {raw_ts}")
        ts = F.col("ts").cast("timestamp")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    # latestFirst=false (default): files process in discovery order.
    return reader.parquet(directory).withColumn("ts", ts)


def tumbling_counts(
    events: DataFrame, window: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling window counts — append mode emits each window
    once, when the watermark passes its end; later-arriving rows for closed
    windows are DROPPED (the late-data contract)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked session windows per user (gap-merge state machine)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def interval_join(
    views: DataFrame,
    purchases: DataFrame,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
    keep_both_users: bool = False,
) -> DataFrame:
    """Stream-stream join: each purchase pairs with the same user's views
    from the preceding ``horizon``.

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions (``view_ts <= purchase_ts <= view_ts + horizon``),
    so the state store evicts each side once the other's watermark passes
    its horizon — without the time bound, stream-stream join state grows
    forever. On batch DataFrames ``withWatermark`` is a no-op and this is
    a plain interval join, which is what lets one definition serve the
    oracled batch query AND the streaming behavior tests.

    ``how='left_outer'``: unmatched views additionally emit with NULL
    purchase columns — but only once the watermark proves no future
    purchase can still match (the row's join window must close), so an
    outer stream result is eventually-equal to the batch left join rather
    than per-trigger-equal. That's the semantics difference the outer
    tests pin: null rows appear ONLY after event time advances past
    view_ts + horizon + watermark."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        how,
    )
    if keep_both_users:
        # full-outer callers: the two user columns differ on null rows
        return joined.select(
            "view_id",
            "purchase_id",
            F.col("v_user").alias("v_user_id"),
            F.col("p_user").alias("p_user_id"),
            "view_ts",
            "purchase_ts",
        )
    return joined.select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on (user_id, event_type) with state bounded
    by the watermark horizon — the streaming form of ``stream_dedup_keys``."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (event count, value sum) maintained in the state store across
    micro-batches, emitting the updated totals each batch.

    This is the escape hatch for operators the built-in windowed/dedup
    state machines can't express (custom sessionization, decaying counters,
    online sketches). State is per-key and explicit — at scale, pair it
    with a timeout (here ``NoTimeout`` since user_id cardinality is
    bounded; real deployments use event-time timeouts to bound state)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n bigint, total double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion into an in-memory table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)


def run_to_files(
    df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
):
    """File-sink job with checkpoint: the sink's ``_spark_metadata`` commit
    log makes replay after restart exactly-once — the engine-managed form
    of the reference's manual ``_SUCCESS``/``_temporary`` protocol."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_foreach_batch_upsert(
    stream_df: DataFrame, target_dir: str, checkpoint_dir: str, key: str
):
    """Streaming CDC apply — the standard ``foreachBatch`` deployment:
    each micro-batch UPSERTS into a parquet target (anti-join the target
    on the batch's keys ∪ the batch — the ``merge_upsert`` emulation;
    with Delta on the classpath the body becomes one MERGE INTO).

    Exactly-once composition: the checkpoint makes batch ids stable, and
    the upsert is idempotent per batch (same keys → same rows), so a
    replayed batch converges. The target swap is crash-safe without a
    table format: write ``__new`` → rename target aside to ``__old`` →
    promote ``__new`` → drop ``__old``, with a recovery pre-pass that
    restores ``__old`` if a crash left no live target — every
    intermediate state heals on the next batch."""
    from ..sources.filesystem import FsClient

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        fs = FsClient(sp)
        new, old = target_dir + "__new", target_dir + "__old"
        # recovery pre-pass (see docstring): restore or discard leftovers
        if not fs.exists(target_dir) and fs.exists(old):
            fs.rename(old, target_dir)
        elif fs.exists(target_dir) and fs.exists(old):
            fs.delete(old)
        if fs.exists(target_dir):
            target = sp.read.parquet(target_dir)
            unchanged = target.join(
                batch_df.select(key).distinct(), key, "left_anti"
            )
            result = unchanged.unionByName(batch_df)
        else:
            result = batch_df
        result.write.mode("overwrite").parquet(new)
        if fs.exists(target_dir):
            fs.rename(target_dir, old)
        fs.rename(new, target_dir)
        fs.delete(old)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _tws_runtime_available() -> bool:
    """``transformWithStateInPandas`` plans in any Spark 4 session, but its
    EXECUTION spawns a streaming Python driver worker that speaks protobuf
    (``google.protobuf``) to the JVM. This container ships no protobuf, so
    the plan builds and then the query crashes at start — the honest gate
    (same policy as multimodal's REAL_CODECS_AVAILABLE) is importability."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


TWS_RUNTIME_AVAILABLE = _tws_runtime_available()


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, value sum) via ``transformWithStateInPandas``
    — Spark 4's successor to ``applyInPandasWithState`` and the API custom
    stateful operators should target going forward: state is named TYPED
    handles acquired in ``init`` (ValueState here; ListState/MapState for
    richer shapes, optional TTL per state) instead of one positional
    tuple, timers are first-class (``handle.registerTimer``) instead of a
    single timeout conf, and the processor object carries the lifecycle
    (``init``/``handleInputRows``/``close``).

    Semantics intentionally identical to :func:`stateful_user_totals` so
    the two APIs are pinned against each other when the runtime is
    available (tests/test_streaming.py; plan-level assertion always runs).
    Requires the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` before starting the query."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("totals", "n bigint, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType="user_id bigint, n bigint, total double",
        outputMode="Update",
        timeMode="None",
    )


def run_available_now(
    df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
):
    """Drain-everything-then-stop file-sink run via ``Trigger.AvailableNow``
    — the deployment mode for INCREMENTAL BATCH: a scheduled job (cron,
    not a resident cluster) that each invocation processes exactly the
    data that arrived since the last run, in rate-limited micro-batches,
    and exits. Same checkpoint + sink-commit-log exactly-once contract as
    the resident stream; unlike ``processAllAvailable`` (a test barrier on
    a running query) the trigger itself guarantees termination, so the
    pattern survives driver schedulers that kill idle jobs. This is the
    engine-managed replacement for the reference's re-run-and-skip
    ``_SUCCESS`` file loop (DatasetYearTrain.java:89-94) at directory
    granularity."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_incremental_matview(
    stream_df: DataFrame, table_dir: str, checkpoint_dir: str
) -> None:
    """INCREMENTAL MATERIALIZED VIEW: maintain a persistent hourly
    aggregate of the event stream by merging each micro-batch's CHANGED
    rows into a :class:`~..sources.lakehouse.LogTable` — the
    streaming-aggregation + foreachBatch + MERGE pattern that keeps a
    queryable, snapshot-versioned rollup current without ever re-scanning
    history.

    Update-mode semantics do the incremental bookkeeping: each trigger
    emits only the (hour, event_type) groups the batch touched, with
    their NEW totals (the state store holds running values). The merge is
    a whole-row upsert on the group key, which makes replay after a
    checkpoint-recovery crash IDEMPOTENT with no batch-id cursor:
    re-merging the same totals writes the same rows. Every micro-batch
    is a table version — the view's history is time-travelable for free.

    State note: no watermark here (totals over all time, keyed by hour);
    state is bounded by (hours × event types). For unbounded keys add a
    watermark and accept finalized-window semantics."""
    from ..sources.lakehouse import LogTable

    agg = (
        stream_df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn(
            "mv_key",
            F.concat_ws("|", F.col("hour").cast("string"), "event_type"),
        )
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        table = LogTable(batch_df.sparkSession, table_dir)
        if batch_df.isEmpty():
            return
        if table.latest_version() is None:
            table.write(batch_df, mode="overwrite")
        else:
            table.merge(batch_df, key="mv_key")

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
