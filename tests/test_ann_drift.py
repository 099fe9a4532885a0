"""Quantizer drift + requantize (r13): the frozen-quantizer append path
(`append_to_ann_index`) accrues distribution-drift debt; the drift report
is the cheap scheduled trigger and `requantize_ann_index` the payoff —
retrain on an md5-spread sample of the CURRENT corpus, preserving
deletions and attributes, fenced as an exclusive (vacuum-class) op."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
    IndexMaintenanceConflict,
    _maintenance_lock,
    append_to_ann_index,
    build_ann_index,
    delete_from_ann_index,
    probe_ann_index,
    quantizer_drift_report,
    requantize_ann_index,
    verify_ann_index,
)
from wod_ascii_to_parquet_spark_spark.registry import load

from .conftest import SF_DIR


def _emb(spark):
    return load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )


def _drifted_delta(spark, shift: float = 2.0, id_offset: int = 100000):
    """A deterministic DRIFTED append batch: every corpus vector shifted
    by +`shift` in dimension 0 and renormalized — a new region of the
    embedding space the original low-vec_id quantizer seeds never saw,
    so frozen-quantizer encoding funnels it into the few cells whose
    centroids lean that way (the skew signature the drift report
    detects)."""
    e = _emb(spark)
    shifted = F.expr(
        f"transform(emb, (v, i) -> CASE WHEN i = 0 THEN v + {shift}D "
        "ELSE v END)"
    )
    unit = F.expr(
        "transform(__s, v -> v / sqrt(aggregate(transform(__s, x -> x * x),"
        " 0.0D, (a, b) -> a + b)))"
    )
    return (
        e.select(
            (F.col("vec_id") + id_offset).alias("vec_id"),
            shifted.alias("__s"),
        )
        .select("vec_id", unit.alias("emb"))
    )


def _drop(spark, t):
    for side in ("", "__codebooks", "__tombstones", "__vacuum_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_drift_report_shape_and_balance_on_fresh_index(spark):
    t = "test_ann_drift_fresh"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        rep = quantizer_drift_report(spark, t)
        n = load(spark, SF_DIR, "embeddings").count()
        assert rep["n_cells"] == 16
        assert rep["rows"] == n
        assert rep["cells_used"] <= 16
        assert rep["imbalance_factor"] >= 1.0
        assert 0.0 <= rep["top_cell_share"] <= 1.0
        assert rep["max_cell_rows"] >= rep["rows"] / 16
    finally:
        _drop(spark, t)


def test_drifted_appends_skew_and_requantize_rebalances(spark):
    """The full debt-and-payoff loop: frozen-quantizer appends of a
    shifted batch skew the cell populations (imbalance_factor rises);
    requantize retrains on an md5-spread sample of the CURRENT corpus
    and the skew falls back. A rebuild with the DEFAULT low-vec_id seed
    rule would NOT rebalance — the low ids are all original-
    distribution rows — which is what makes requantize a distinct op."""
    t = "test_ann_drift_req"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        before_append = quantizer_drift_report(spark, t)
        delta = _drifted_delta(spark)
        append_to_ann_index(spark, delta, table=t)
        drifted = quantizer_drift_report(spark, t)
        # the shifted half funnels into few old cells: skew must rise
        assert drifted["imbalance_factor"] > before_append["imbalance_factor"]
        assert drifted["rows"] == 2 * before_append["rows"]

        live = _emb(spark).unionByName(delta)
        out = requantize_ann_index(spark, live, table=t)
        assert out["old_build_id"] != out["new_build_id"]
        after = out["drift_after"]
        assert after["rows"] == drifted["rows"]
        assert after["imbalance_factor"] < drifted["imbalance_factor"]
        # md5-spread seeds sample the DRIFTED region too: at least one
        # cell id comes from the appended id range
        cells = {
            r[0] for r in spark.table(t).select("cell").distinct().collect()
        }
        assert any(c >= 100000 for c in cells)
        # the rebuilt index serves: probes run against the new quantizer
        q = _emb(spark).filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
        got = probe_ann_index(
            spark, q, table=t, nprobe=4, k=3, exclude_self=True
        ).collect()
        assert len(got) == 15
        assert verify_ann_index(spark, t)["consistent"]
    finally:
        _drop(spark, t)


def test_requantize_preserves_deletions(spark):
    """Requantize is maintenance of the SAME corpus: live tombstones are
    anti-joined out before encoding, so a takedown survives the retrain
    (physically absent from the new generation; sidecar cleared)."""
    t = "test_ann_drift_del"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        q = _emb(spark).filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
        serving = {
            r[1]
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        victim = max(serving)
        delete_from_ann_index(
            spark,
            _emb(spark).filter(F.col("vec_id") == victim).select("vec_id"),
            table=t,
        )
        requantize_ann_index(spark, _emb(spark), table=t)
        assert spark.table(t).filter(F.col("vec_id") == victim).count() == 0
        assert not spark.catalog.tableExists(f"{t}__tombstones")
        after = {
            r[1]
            for r in probe_ann_index(
                spark, q, table=t, nprobe=16, k=3, exclude_self=True
            ).collect()
        }
        assert victim not in after
    finally:
        _drop(spark, t)


def test_requantize_is_exclusive_and_requires_attributes(spark):
    """Requantize shares the exclusive lock class with vacuum (a
    concurrent append would encode against whichever quantizer wins) and
    refuses to silently drop an attributed index's filter columns."""
    t = "test_ann_drift_excl"
    try:
        emb = load(spark, SF_DIR, "embeddings")
        build_ann_index(
            spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
            attributes=emb.select("vec_id", "label"),
        )
        with _maintenance_lock(spark, t, "append"):
            with pytest.raises(
                IndexMaintenanceConflict, match="requantize refused"
            ):
                requantize_ann_index(
                    spark, _emb(spark), table=t,
                    attributes=emb.select("vec_id", "label"),
                )
        with _maintenance_lock(spark, t, "vacuum"):
            with pytest.raises(
                IndexMaintenanceConflict, match="requantize refused"
            ):
                requantize_ann_index(
                    spark, _emb(spark), table=t,
                    attributes=emb.select("vec_id", "label"),
                )
        with pytest.raises(ValueError, match="attribute columns"):
            requantize_ann_index(spark, _emb(spark), table=t)
        out = requantize_ann_index(
            spark, _emb(spark), table=t,
            attributes=emb.select("vec_id", "label"),
        )
        assert out["old_build_id"] != out["new_build_id"]
        # attributes survived: filtered probes still work
        q = _emb(spark).filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
        got = probe_ann_index(
            spark, q, table=t, nprobe=8, k=3, exclude_self=True,
            candidate_filter="label % 2 = 0",
        ).collect()
        eligible = {
            r[0]
            for r in emb.filter(F.col("label") % 2 == 0)
            .select("vec_id")
            .collect()
        }
        assert got and {r["vec_id"] for r in got} <= eligible
    finally:
        _drop(spark, t)


def test_cli_drift_index_prints_report(spark, capsys):
    import json as _json

    from wod_ascii_to_parquet_spark_spark.table_cli import main

    t = "test_ann_drift_cli"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        rc = main(["drift-index", t])
        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert doc["n_cells"] == 16 and doc["imbalance_factor"] >= 1.0
    finally:
        _drop(spark, t)


def test_cli_requantize_index_runs_and_respects_fence(spark, capsys):
    """The ops loop closes from a shell: drift-index (trigger) ->
    requantize-index (action), with before/after drift evidence in the
    output and exit 3 under a held mutator lock."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark.table_cli import main

    t = "test_ann_drift_cli_rq"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        vec_path = f"{SF_DIR}/embeddings.parquet"
        with _maintenance_lock(spark, t, "append"):
            rc = main(["requantize-index", t, "--vectors", vec_path])
            doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert rc == 3 and "requantize refused" in doc["refused"]
        rc = main(["requantize-index", t, "--vectors", vec_path])
        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert doc["old_build_id"] != doc["new_build_id"]
        assert doc["drift_after"]["rows"] == doc["drift_before"]["rows"]
    finally:
        _drop(spark, t)


def test_requantize_survives_deleted_low_vec_id(spark):
    """Review r13 (total-loss path): vectors 0..15 seed the PQ codebook
    under the raw low-id rule, and the inner rebuild DROPS the tables
    before its plans evaluate — so a requantize after deleting a low id
    used to fire the codebook contiguity assert mid-rebuild and destroy
    the index. The codebook now seeds from the first 16 LIVE vectors
    (remapped to contiguous ids), so the takedown-then-retrain sequence
    reachable from the CLI must succeed and keep serving."""
    t = "test_ann_drift_lowdel"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        delete_from_ann_index(
            spark,
            _emb(spark).filter(F.col("vec_id") == 3).select("vec_id"),
            table=t,
        )
        out = requantize_ann_index(spark, _emb(spark), table=t)
        assert out["old_build_id"] != out["new_build_id"]
        assert spark.table(t).filter(F.col("vec_id") == 3).count() == 0
        q = _emb(spark).filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
        got = probe_ann_index(
            spark, q, table=t, nprobe=8, k=3, exclude_self=True
        ).collect()
        assert len(got) == 15
        assert 3 not in {r["vec_id"] for r in got}
        assert verify_ann_index(spark, t)["consistent"]
    finally:
        _drop(spark, t)


def test_drift_report_excludes_tombstone_mass(spark):
    """Tombstoned rows are masked at every probe, so they are not
    serving cost: the drift report must not count them toward cell
    populations (a mass takedown would otherwise trigger an exclusive
    requantize whose cheaper remedy is vacuum) — their mass is reported
    separately."""
    t = "test_ann_drift_tombmass"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        before = quantizer_drift_report(spark, t)
        assert before["tombstoned_vec_ids"] == 0
        victims = _emb(spark).filter(F.col("vec_id") % 2 == 0).select("vec_id")
        n = delete_from_ann_index(spark, victims, table=t)
        after = quantizer_drift_report(spark, t)
        assert after["tombstoned_vec_ids"] == n
        assert after["rows"] == before["rows"] - n
    finally:
        _drop(spark, t)
