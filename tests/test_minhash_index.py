"""Persisted MinHash signature index (plans/minhash_index.py): an index
grown by appends must be row-identical to one built fresh over the union,
the self-probe must reproduce the live oracled LSH arm exactly, external
batches must probe without the self-exclusion trap, torn builds must fail
fast, and the bucketed index side of the band equi-join must be
Exchange-free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
    append_minhash_index,
    build_minhash_index,
    probe_minhash_index,
)
from wod_ascii_to_parquet_spark_spark.registry import load, load_all_operators

from .conftest import SF_DIR

QUERIES = load_all_operators()
TABLE = "test_mh_idx"
_ALL_TABLES = [
    t
    for base in (TABLE, f"{TABLE}_full", f"{TABLE}_ext")
    for t in (base, f"{base}__docs", f"{base}__meta")
]


@pytest.fixture(scope="module")
def mh_index(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    build_minhash_index(
        spark, d.filter(F.col("doc_id") < 250), table=TABLE, family="md5"
    )
    append_minhash_index(spark, d.filter(F.col("doc_id") >= 250), table=TABLE)
    yield TABLE
    for t in _ALL_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jac) for r in df.collect()}


def test_append_equals_fresh_build(spark, mh_index):
    """Build(half) + append(half) must be ROW-IDENTICAL to build(full) in
    both stored tables (modulo build_id) — the data-independent hash
    family makes incremental exact-forever, and this is the assertion
    that keeps that claim code, not docstring."""
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    build_minhash_index(spark, d, table=f"{TABLE}_full", family="md5")
    grown = spark.table(TABLE).select("doc_id", "band", "key")
    fresh = spark.table(f"{TABLE}_full").select("doc_id", "band", "key")
    assert grown.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(grown).count() == 0
    gd = spark.table(f"{TABLE}__docs").select("doc_id", "sh")
    fd = spark.table(f"{TABLE}_full__docs").select("doc_id", "sh")
    assert gd.exceptAll(fd).count() == 0
    assert fd.exceptAll(gd).count() == 0


def test_self_probe_equals_live_lsh_arm(spark, mh_index):
    """Corpus self-probe against the appended index == the live
    (DuckDB-oracled) dedup_minhash_lsh_md5 pair set — the persisted path
    inherits the oracle through exact agreement."""
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    got = _pairs(probe_minhash_index(spark, d, table=TABLE, self_probe=True))
    live = _pairs(QUERIES["dedup_minhash_lsh_md5"].fn(spark, SF_DIR))
    assert got == live and got


def test_registered_index_query_equals_live_arm(spark, mh_index):
    """The registered dedup_minhash_index_md5 (build→append→self-probe in
    one query, sharing the live arm's oracle SQL) returns the same pairs."""
    got = _pairs(QUERIES["dedup_minhash_index_md5"].fn(spark, SF_DIR))
    live = _pairs(QUERIES["dedup_minhash_lsh_md5"].fn(spark, SF_DIR))
    assert got == live and got


def test_external_batch_probe_no_self_exclusion(spark, mh_index):
    """An externally-numbered batch (re-crawl of indexed docs under new
    ids) must match its indexed twins: with self_probe=False an id
    collision must NOT suppress a legitimate pair, and every replayed doc
    must hit its original at jac == 1.0."""
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    replay = d.filter(F.col("doc_id") < 20)
    # id-colliding replay: same ids as indexed docs, identical text
    hits = probe_minhash_index(spark, replay, table=TABLE, self_probe=False)
    exact = {(r.doc_a, r.doc_b) for r in hits.filter("jac = 1.0").collect()}
    assert {(i, i) for i in range(20)} <= exact
    # renumbered replay: new namespace, still must match the originals
    renum = replay.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    hits2 = probe_minhash_index(spark, renum, table=TABLE, self_probe=False)
    exact2 = {(r.doc_a, r.doc_b) for r in hits2.filter("jac = 1.0").collect()}
    assert {(i, i + 100000) for i in range(20)} <= exact2


def test_torn_build_fails_fast(spark, mh_index):
    """A meta row whose build_id no data row carries (crash mid-build)
    must be refused by probe, not silently produce candidates."""
    spark.createDataFrame(
        [("md5", "deadbeef")], "family string, build_id string"
    ).write.format("parquet").mode("overwrite").saveAsTable(f"{TABLE}__meta")
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    with pytest.raises(RuntimeError, match="different builds|re-run build"):
        probe_minhash_index(spark, d, table=TABLE)
    # restore a consistent meta row for any later test in the module
    real = spark.table(TABLE).select("build_id").first()["build_id"]
    spark.createDataFrame(
        [("md5", real)], "family string, build_id string"
    ).write.format("parquet").mode("overwrite").saveAsTable(f"{TABLE}__meta")


def test_unknown_family_rejected(spark):
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    with pytest.raises(ValueError, match="unknown hash family"):
        build_minhash_index(spark, d, table=f"{TABLE}_ext", family="sha9")


def test_probe_index_side_exchange_free(spark, mh_index):
    """The band equi-join must read the stored (band, key)-bucketed table
    without an Exchange on the index side — that is the entire point of
    paying the build shuffle once."""
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    import re

    def _plan(broadcast: bool, bucketing: bool) -> str:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            "10485760" if broadcast else "-1",
        )
        spark.conf.set(
            "spark.sql.sources.bucketing.enabled", str(bucketing).lower()
        )
        try:
            df = probe_minhash_index(spark, d, table=TABLE, self_probe=True)
            return df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.sources.bucketing.enabled", "true")

    # at fixture scale the batch side is broadcast — the index side scans
    # its buckets directly with no Exchange anywhere near it
    assert "Bucketed: true" in _plan(broadcast=True, bucketing=True)
    # at scale (broadcast off → SortMergeJoin) the bucketed index side
    # must still not shuffle: differential vs bucketing disabled, which
    # needs strictly more Exchanges for the very same probe
    n_bucketed = len(
        re.findall(r"\(\d+\) Exchange", _plan(broadcast=False, bucketing=True))
    )
    n_flat = len(
        re.findall(r"\(\d+\) Exchange", _plan(broadcast=False, bucketing=False))
    )
    assert n_bucketed < n_flat, (n_bucketed, n_flat)


def test_vacuum_compacts_and_preserves_probe(spark):
    """VERDICT r9 #5: vacuum must (a) drop rows from superseded build_id
    generations — invisible to the one-row torn-build check — (b) shrink
    the append-accumulated file sets to one bucketed generation per side,
    and (c) change NOTHING about probe results, including the
    Exchange-free bucketed probe plan (the catalog rename must carry the
    bucket spec)."""
    import re

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_data_file_count,
        _table_num_buckets,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        vacuum_minhash_index,
    )

    t = "test_mh_idx_vac"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(
            spark, d.filter(F.col("doc_id") < 200), table=t, family="md5"
        )
        append_minhash_index(
            spark,
            d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 350)),
            table=t,
        )
        append_minhash_index(spark, d.filter(F.col("doc_id") >= 350), table=t)
        # probe BEFORE injecting the stale generation: the probe's cheap
        # one-row build_id check may (legitimately, nondeterministically)
        # fire on a mixed-generation table — the state vacuum heals — so
        # the reference pair set comes from the clean index. Stale band
        # rows would not change the pair set anyway (candidates are
        # de-duplicated), but the check makes a post-injection probe
        # flaky (ADVICE r10).
        before = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        # inject a superseded generation, as an interrupted rebuild would
        # strand: same schema, stale build_id
        n_buckets = _table_num_buckets(spark, t)
        stale = (
            spark.table(t)
            .limit(37)
            .withColumn("build_id", F.lit("superseded-build"))
        )
        (
            stale.write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        files_before = _table_data_file_count(spark, t)
        rows_before = spark.table(t).count()

        stats = vacuum_minhash_index(spark, table=t)
        assert stats["bands"]["rows_dropped"] == 37
        assert stats["docs"]["rows_dropped"] == 0
        assert stats["bands"]["files_after"] < files_before
        assert spark.table(t).count() == rows_before - 37
        assert (
            spark.table(t).filter(F.col("build_id") == "superseded-build").count()
            == 0
        )
        # bucket spec survived the rename: same n_buckets, and the probe
        # plan still reads the index side without an Exchange under it
        assert _table_num_buckets(spark, t) == n_buckets
        after = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        assert after == before and after

        plan = (
            probe_minhash_index(spark, d, table=t, self_probe=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        scans = [
            m.start() for m in re.finditer(r"FileScan parquet [^\n]*" + t, plan)
        ]
        assert scans, plan
        assert f"SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_verify_detects_torn_and_double_appends_and_vacuum_heals(spark):
    """The two silent-corruption states of the incremental path, detected
    by verify_minhash_index and healed by the documented recovery:

    - torn append (bands landed, sidecar didn't): flagged; re-appending
      the same delta restores correct probe results (band duplicates are
      de-duplicated before verify), and vacuum removes the duplicates.
    - double append of one delta: duplicate sidecar rows DUPLICATE probe
      output pairs (demonstrated); vacuum's full-row dedup restores the
      exact single-append results."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_num_buckets,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        _band_keys,
        _sig_frame,
        vacuum_minhash_index,
        verify_minhash_index,
    )

    t = "test_mh_idx_torn"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(
            spark, d.filter(F.col("doc_id") < 400), table=t, family="md5"
        )
        delta = d.filter(F.col("doc_id") >= 400)

        # --- torn append: band keys land, crash before the sidecar ---
        n_buckets = _table_num_buckets(spark, t)
        sigs = _sig_frame(delta, "md5")
        (
            _band_keys(sigs)
            .withColumn("build_id", F.lit(spark.table(f"{t}__meta").first()["build_id"]))
            .write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rep = verify_minhash_index(spark, table=t)
        assert not rep["consistent"] and rep["band_docids_missing_sidecar"] > 0

        # documented recovery: re-append the SAME delta, then vacuum
        append_minhash_index(spark, delta, table=t)
        rep = verify_minhash_index(spark, table=t)
        assert rep["consistent"], rep
        expected = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        stats = vacuum_minhash_index(spark, table=t)
        assert stats["bands"]["rows_dropped"] > 0  # the duplicated band keys
        assert _pairs(
            probe_minhash_index(spark, d, table=t, self_probe=True)
        ) == expected

        # --- double append of one delta: sidecar duplicates duplicate
        # probe PAIRS (rows, not just the pair set) ---
        append_minhash_index(spark, delta, table=t)
        rep = verify_minhash_index(spark, table=t)
        assert not rep["consistent"] and rep["duplicate_sidecar_docids"] > 0
        probe_rows = probe_minhash_index(
            spark, d, table=t, self_probe=True
        ).count()
        expected_rows = len(expected)
        assert probe_rows > expected_rows  # duplicated output rows = corruption
        vacuum_minhash_index(spark, table=t)
        assert verify_minhash_index(spark, table=t)["consistent"]
        healed = probe_minhash_index(spark, d, table=t, self_probe=True)
        assert healed.count() == expected_rows
        assert _pairs(healed) == expected
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_verify_reports_stranded_generations_deterministically(spark):
    """ADVICE r10: the probe's one-row build_id check is nondeterministic
    on a mixed-generation table; verify_minhash_index is the deterministic
    report — a full DISTINCT build_id vs __meta comparison per side.
    Stranded generations are not silent corruption (consistent stays
    True), they flip current_generation_only, and vacuum heals them."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_num_buckets,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        vacuum_minhash_index,
        verify_minhash_index,
    )

    t = "test_mh_idx_stranded"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(
            spark, d.filter(F.col("doc_id") < 150), table=t, family="md5"
        )
        rep = verify_minhash_index(spark, table=t)
        assert rep["current_generation_only"] and rep["consistent"]
        assert rep["stranded_build_ids"] == {"bands": [], "docs": []}

        n_buckets = _table_num_buckets(spark, t)
        stale = (
            spark.table(t)
            .limit(11)
            .withColumn("build_id", F.lit("superseded-build"))
        )
        (
            stale.write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rep = verify_minhash_index(spark, table=t)
        assert rep["stranded_build_ids"]["bands"] == ["superseded-build"]
        assert rep["stranded_build_ids"]["docs"] == []
        assert not rep["current_generation_only"]
        assert rep["consistent"]  # stranded != silent corruption

        vacuum_minhash_index(spark, table=t)
        rep = verify_minhash_index(spark, table=t)
        assert rep["current_generation_only"] and rep["consistent"]
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_cli_vacuum_index_minhash_dry_run_and_run(spark, capsys):
    """VERDICT r10 #5: the index-vacuum lifecycle is reachable through
    the ops CLI. Dry run must list the stale generation per side and
    change nothing; the real run must drop it and preserve the probe
    pair set exactly."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_num_buckets,
    )

    t = "test_mh_idx_cli"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(spark, d, table=t, family="md5")
        before = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        n_buckets = _table_num_buckets(spark, t)
        (
            spark.table(t)
            .limit(13)
            .withColumn("build_id", F.lit("superseded-build"))
            .write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rows_with_stale = spark.table(t).count()

        assert table_cli.main(["vacuum-index", t, "--kind", "minhash", "--dry-run"]) == 0
        dry = _json.loads(capsys.readouterr().out.strip())
        assert dry["dry_run"] is True
        bands = dry["sides"][t]
        assert bands["generations_to_drop"] == ["superseded-build"]
        assert bands["rows_to_drop"] == 13
        assert dry["sides"][f"{t}__docs"]["generations_to_drop"] == []
        # dry run changed nothing
        assert spark.table(t).count() == rows_with_stale

        assert table_cli.main(["vacuum-index", t, "--kind", "minhash"]) == 0
        out = _json.loads(capsys.readouterr().out.strip())
        assert out["stats"]["bands"]["rows_dropped"] == 13
        after = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        assert after == before and after
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_cli_verify_index_reports_and_exit_code(spark, capsys):
    """r11: verify-index through the ops CLI — clean index exits 0 with
    consistent=true; a double-append exits 1 (scheduled-health-check
    contract); vacuum restores exit 0."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli

    t = "test_mh_idx_vfycli"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(
            spark, d.filter(F.col("doc_id") < 200), table=t, family="md5"
        )
        assert table_cli.main(["verify-index", t, "--kind", "minhash"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip())
        assert rep["consistent"] and rep["current_generation_only"]

        # double append duplicates sidecar rows = probe-corrupting state
        append_minhash_index(
            spark, d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 250)),
            table=t,
        )
        append_minhash_index(
            spark, d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 250)),
            table=t,
        )
        assert table_cli.main(["verify-index", t, "--kind", "minhash"]) == 1
        rep = _json.loads(capsys.readouterr().out.strip())
        assert rep["duplicate_sidecar_docids"] > 0

        from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
            vacuum_minhash_index,
        )

        vacuum_minhash_index(spark, table=t)
        assert table_cli.main(["verify-index", t, "--kind", "minhash"]) == 0
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_cli_verify_index_strict_alerts_on_stranded_generation(spark, capsys):
    """ADVICE r11: minhash 'consistent' deliberately excludes stranded
    generations (they cannot change probe results), so plain verify-index
    exits 0 on that state — a scheduler keying on the exit code would
    never trigger the vacuum that heals it. --strict folds
    current_generation_only into the exit code for BOTH kinds."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        _table_num_buckets,
        vacuum_minhash_index,
    )

    t = "test_mh_idx_strictcli"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(
            spark, d.filter(F.col("doc_id") < 200), table=t, family="md5"
        )
        # strand a superseded generation in the band table only
        n_buckets = _table_num_buckets(spark, t)
        (
            spark.table(t)
            .limit(13)
            .withColumn("build_id", F.lit("superseded-build"))
            .write.bucketBy(n_buckets, "band", "key")
            .sortBy("band", "key")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        # non-strict: stranded-only state is vacuum-able debt, exit 0
        assert table_cli.main(["verify-index", t, "--kind", "minhash"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip())
        assert rep["consistent"] and not rep["current_generation_only"]
        # strict: same state exits 1 — schedulers can alert without JSON
        assert (
            table_cli.main(["verify-index", t, "--kind", "minhash", "--strict"])
            == 1
        )
        capsys.readouterr()
        vacuum_minhash_index(spark, table=t)
        assert (
            table_cli.main(["verify-index", t, "--kind", "minhash", "--strict"])
            == 0
        )
    finally:
        for side in ("", "__docs", "__meta", "__vacuum_tmp", "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


# ---------------------------------------------------------------------------
# Hot-bucket guards on the PERSISTED index (SCALE.md §Round 13 follow-
# through): the stored band table shares the live band join's quadratic
# exposure — a band bucket of m docs emits m×|batch-hits| pairs in one
# probe task — so floods are refused at INGEST (build/append, before any
# write), the probe's BATCH side carries the live in-plan guard, and
# verify reports hotness for indexes built under a raised bound.

_FLOOD_TABLE = "test_mh_idx_flood"


def _flood(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "identical document text repeated verbatim across the corpus "
            "many times over and over again"
        ).alias("text"),
    )


def _drop_index(spark, base):
    for side in ("", "__docs", "__meta"):
        spark.sql(f"DROP TABLE IF EXISTS {base}{side}")


def test_ingest_guard_refuses_flood_before_any_write(spark, monkeypatch):
    """A flood build is refused with the dedup_exact-first contract, and
    the refusal lands BEFORE `_clear_table` — a refused REBUILD leaves
    the existing healthy index byte-identical."""
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "10")
    try:
        with pytest.raises(RuntimeError, match="dedup_exact"):
            build_minhash_index(
                spark, _flood(spark, 40), table=_FLOOD_TABLE, family="md5"
            )
        assert not spark.catalog.tableExists(_FLOOD_TABLE)
        build_minhash_index(
            spark, _flood(spark, 6), table=_FLOOD_TABLE, family="md5"
        )
        before = spark.table(_FLOOD_TABLE).count()
        with pytest.raises(RuntimeError, match="refusing minhash index build"):
            build_minhash_index(
                spark, _flood(spark, 40), table=_FLOOD_TABLE, family="md5"
            )
        assert spark.table(_FLOOD_TABLE).count() == before
        with pytest.raises(RuntimeError, match="refusing minhash index append"):
            append_minhash_index(
                spark, _flood(spark, 40, start=100), table=_FLOOD_TABLE
            )
        assert spark.table(_FLOOD_TABLE).count() == before
    finally:
        _drop_index(spark, _FLOOD_TABLE)


def test_append_budget_counts_stored_accumulation(spark, monkeypatch):
    """Hotness ACCUMULATES: two ingests each under the bound but summing
    past it must be refused — the append check counts delta + stored
    rows for the touched keys, not the delta alone."""
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "10")
    try:
        build_minhash_index(
            spark, _flood(spark, 6), table=_FLOOD_TABLE, family="md5"
        )
        with pytest.raises(RuntimeError, match="would hold 12 docs"):
            append_minhash_index(
                spark, _flood(spark, 6, start=100), table=_FLOOD_TABLE
            )
        # disjoint-key growth is untouched: real fixture docs append fine
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        assert append_minhash_index(
            spark, d.limit(20), table=_FLOOD_TABLE
        ) == 20
    finally:
        _drop_index(spark, _FLOOD_TABLE)


def test_probe_batch_flood_guarded_in_plan(spark, mh_index, monkeypatch):
    """The other explosion direction — a flood PROBE batch against a
    healthy index — fails in-plan (assert_true before the band join)
    with the same contract."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "10")
    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="dedup_exact"
    ):
        probe_minhash_index(spark, _flood(spark, 40), table=mh_index).collect()


def test_verify_reports_band_bucket_hotness(spark, mh_index, monkeypatch):
    """verify_minhash_index surfaces bucket hotness (for indexes built
    under a raised bound) WITHOUT flipping `consistent` — a capacity
    hazard, not corruption."""
    from wod_ascii_to_parquet_spark_spark.operators.dedup import (
        _MINHASH_BUCKET_BOUND_DEFAULT,
    )
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        verify_minhash_index,
    )

    rep = verify_minhash_index(spark, mh_index)
    assert rep["band_bucket_bound"] == _MINHASH_BUCKET_BOUND_DEFAULT
    assert rep["hot_band_buckets"] == 0
    assert rep["max_band_bucket_docs"] >= 1
    assert rep["consistent"]
    monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "0")
    rep2 = verify_minhash_index(spark, mh_index)
    assert rep2["hot_band_buckets"] >= 1
    assert rep2["consistent"]


def test_delete_masks_probe_and_vacuum_physically_reclaims(spark):
    """The takedown lifecycle (r13, minhash side): tombstoned index docs
    stop generating candidates immediately (mask = broadcast anti-join
    BEFORE the band join); vacuum applies the tombstones to BOTH
    bucketed sides and clears the sidecar, with probe results unchanged
    — the mask and the reclaim must be equivalent."""
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        delete_from_minhash_index,
        probe_minhash_index,
        vacuum_minhash_index,
        vacuum_minhash_index_dry_run,
        verify_minhash_index,
    )

    t = "test_mh_idx_del"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(spark, d, table=t, family="md5")

        def probe():
            return _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))

        clean = probe()
        assert clean, "fixture must produce near-dup pairs"
        # delete the index side of one real pair so the mask is visible
        victim = min(a for a, _b, _j in clean)
        victims = d.filter(F.col("doc_id") == victim).select("doc_id")
        bands_before = spark.table(t).count()
        n = delete_from_minhash_index(spark, victims, table=t)
        assert n == 1
        masked = probe()
        assert not {p for p in masked if p[0] == victim}
        assert masked == {p for p in clean if p[0] != victim}
        # O(sidecar): neither bucketed side was rewritten
        assert spark.table(t).count() == bands_before
        assert verify_minhash_index(spark, t)["tombstoned_doc_ids"] == 1
        assert vacuum_minhash_index_dry_run(spark, t)[
            "tombstones_to_reclaim"
        ] == 1
        stats = vacuum_minhash_index(spark, table=t)
        assert stats["tombstones_applied"] == 1
        # physically gone from both sides, sidecar cleared
        assert spark.table(t).filter(F.col("doc_id") == victim).count() == 0
        assert (
            spark.table(f"{t}__docs").filter(F.col("doc_id") == victim).count()
            == 0
        )
        assert not spark.catalog.tableExists(f"{t}__tombstones")
        assert probe() == masked
        rep = verify_minhash_index(spark, t)
        assert rep["tombstoned_doc_ids"] == 0 and rep["consistent"]
    finally:
        for side in ("", "__docs", "__meta", "__tombstones", "__vacuum_tmp",
                     "__docs__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_minhash_delete_is_generation_scoped(spark):
    """A rebuild clears the tombstone sidecar: deletions of the previous
    corpus must not mask the new one's rows."""
    from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
        delete_from_minhash_index,
        probe_minhash_index,
    )

    t = "test_mh_idx_del_gen"
    try:
        d = load(spark, SF_DIR, "documents").select("doc_id", "text")
        build_minhash_index(spark, d, table=t, family="md5")
        clean = _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
        victim = min(a for a, _b, _j in clean)
        delete_from_minhash_index(
            spark, d.filter(F.col("doc_id") == victim).select("doc_id"),
            table=t,
        )
        build_minhash_index(spark, d, table=t, family="md5")
        assert not spark.catalog.tableExists(f"{t}__tombstones")
        assert (
            _pairs(probe_minhash_index(spark, d, table=t, self_probe=True))
            == clean
        )
    finally:
        for side in ("", "__docs", "__meta", "__tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")
