"""Persisted IVFADC index: the stored build/probe split must return exactly
what the live DuckDB-oracled one-shot query returns, fail fast on a torn
index/codebook pair, serve externally-numbered query batches without the
self-exclusion trap, and keep the bucketed index side of a cell equi-join
Exchange-free."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
    build_ann_index,
    probe_ann_index,
)
from wod_ascii_to_parquet_spark_spark.registry import load, load_all_operators

from .conftest import SF_DIR

TABLE = "test_ann_idx"


@pytest.fixture(scope="module")
def ann_index(spark):
    # n_cells pinned to the live similarity_ann_ivf_adc query's fixed
    # 16-cell quantizer: the equivalence test below inherits the oracle's
    # guarantee only through exact agreement with that query. The
    # PRODUCTION default (n_cells=None -> ceil(sqrt(N))) is covered by
    # test_default_cells_scale_sqrt_n.
    build_ann_index(spark, SF_DIR, table=TABLE, n_buckets=8, n_cells=16)
    yield TABLE
    for t in (TABLE, f"{TABLE}__codebooks", "test_ann_idx2",
              "test_ann_idx2__codebooks"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _queries(spark):
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    return e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )


def test_persisted_probe_matches_live_oracled_query(spark, ann_index):
    """probe(stored index) must equal the live similarity_ann_ivf_adc —
    the persisted path inherits the oracle's guarantee only through exact
    agreement with the query the oracle checks (queries are corpus
    vectors here, so self-exclusion is on, matching the live query)."""
    live = (
        load_all_operators()["similarity_ann_ivf_adc"]
        .fn(spark, SF_DIR)
        .collect()
    )
    stored = probe_ann_index(
        spark, _queries(spark), table=ann_index, nprobe=4, k=3,
        exclude_self=True,
    ).collect()
    assert {tuple(r) for r in stored} == {tuple(r) for r in live}
    assert len(stored) == len(live)


def test_external_query_numbering_keeps_all_candidates(spark, ann_index):
    """External batches have their own qid numbering: with the default
    exclude_self=False, renumbering the queries must not change which
    neighbors are returned (the old unconditional vec_id != qid filter
    silently dropped one legitimate candidate per colliding qid)."""
    base = {
        (r.qid, r.vec_id)
        for r in probe_ann_index(
            spark, _queries(spark), table=ann_index, k=3
        ).collect()
    }
    shifted = _queries(spark).select(
        (F.col("qid") + 100000).alias("qid"), "qemb"
    )
    got = {
        (r.qid - 100000, r.vec_id)
        for r in probe_ann_index(
            spark, shifted, table=ann_index, k=3
        ).collect()
    }
    assert got == base
    # and each corpus-vector query's own vector survives as a candidate
    assert all((q, q) in base for q in range(10))


def test_index_schema_and_size(spark, ann_index):
    """The stored index is (vec_id, cell, codes[8], build_id) — 8 small
    ints of payload per vector — plus a one-row codebook sidecar table
    stamped with the same build_id."""
    idx = spark.table(ann_index)
    assert set(idx.columns) == {"vec_id", "cell", "codes", "build_id"}
    n_corpus = load(spark, SF_DIR, "embeddings").count()
    assert idx.count() == n_corpus
    assert idx.filter(F.size("codes") != 8).count() == 0
    books = spark.table(f"{ann_index}__codebooks")
    assert books.count() == 1
    assert set(books.columns) == {"__seeds", "__pq_seeds", "build_id"}
    assert (
        books.first()["build_id"] == idx.select("build_id").first()["build_id"]
    )


def test_default_cells_scale_sqrt_n(spark, ann_index):
    """The production default (n_cells=None) sizes the IVF quantizer to
    ceil(sqrt(N)) — the FAISS rule — so per-probe candidate volume stays
    ~nprobe·√N as the corpus grows instead of degrading toward a full
    scan at a fixed cell count. The persisted quantizer is what probes
    read, so the default changes no existing probe's result."""
    import math

    build_ann_index(spark, SF_DIR, table="test_ann_sqrtn", n_buckets=8)
    try:
        n = load(spark, SF_DIR, "embeddings").count()
        books = spark.table("test_ann_sqrtn__codebooks")
        n_seeds = books.select(F.size("__seeds")).first()[0]
        assert n_seeds == math.ceil(math.sqrt(n))
        # every cell id is one of the seed vec_ids
        cells = {
            r[0]
            for r in spark.table("test_ann_sqrtn")
            .select("cell")
            .distinct()
            .collect()
        }
        assert cells <= set(range(n_seeds))
    finally:
        for t in ("test_ann_sqrtn", "test_ann_sqrtn__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_probe_rejects_torn_index_codebook_pair(spark, ann_index):
    """A crash between the codebook and index writes leaves a mismatched
    pair; the probe must fail fast instead of ranking codes against a
    stale codebook."""
    build_ann_index(spark, SF_DIR, table="test_ann_idx2", n_buckets=8)
    # splice index A with codebooks B (different build ids)
    spark.table("test_ann_idx2__codebooks").write.mode(
        "overwrite"
    ).saveAsTable(f"{ann_index}__codebooks_torn")
    try:
        spark.sql(
            f"ALTER TABLE {ann_index}__codebooks RENAME TO "
            f"{ann_index}__codebooks_orig"
        )
        spark.sql(
            f"ALTER TABLE {ann_index}__codebooks_torn RENAME TO "
            f"{ann_index}__codebooks"
        )
        with pytest.raises(RuntimeError, match="different builds"):
            probe_ann_index(spark, _queries(spark), table=ann_index)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ann_index}__codebooks")
        spark.sql(
            f"ALTER TABLE {ann_index}__codebooks_orig RENAME TO "
            f"{ann_index}__codebooks"
        )


def test_index_side_of_cell_join_is_exchange_free(spark, ann_index):
    """The large-query-batch tier joins cell-assigned queries against the
    index on cell; bucketing must leave the INDEX side shuffle-free (only
    the query side exchanges) — the paid-once build shuffle discipline of
    plans/bucketing.py applied to ANN serving."""
    q = _queries(spark).withColumn("cell", F.col("qid") % 8)
    joined = spark.table(ann_index).hint("merge").join(q, "cell")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    import re

    assert "Bucketed: true" in plan, plan[:4000]
    assert "SelectedBucketsCount" in plan, plan[:4000]
    # exactly one Exchange operator in the whole plan: the ad-hoc query
    # side (the bucketed index side sorts within buckets, never shuffles)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan[:4000]


def test_incremental_append_equals_full_build(spark):
    """build(subset) + append(delta) must probe identically to
    build(full): the frozen quantizer encodes the delta into the same
    cells/codes a full rebuild would (both use the vec_id<16 seeds)."""
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        append_to_ann_index,
        build_ann_index,
        probe_ann_index,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load

    from .conftest import SF_DIR

    import shutil

    for t in ("annx_full", "annx_full__codebooks", "annx_incr",
              "annx_incr__codebooks", "annx_incr_sub"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)

    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )

    build_ann_index(spark, SF_DIR, table="annx_full")
    full = {
        tuple(r)
        for r in probe_ann_index(spark, queries, table="annx_full").collect()
    }

    # Construct the subset state honestly (parquet tables have no
    # DELETE): build the full table for its codebooks, then rewrite the
    # index with only the first 300 rows and append the rest through the
    # incremental path — equivalent to build(subset) + append(delta).
    build_ann_index(spark, SF_DIR, table="annx_incr")
    subset = spark.table("annx_incr").filter(F.col("vec_id") < 300)
    subset.write.bucketBy(8, "cell").sortBy("cell").format(
        "parquet"
    ).mode("overwrite").saveAsTable("annx_incr_sub")
    spark.sql("DROP TABLE annx_incr")
    spark.sql("ALTER TABLE annx_incr_sub RENAME TO annx_incr")
    delta = e.filter(F.col("vec_id") >= 300)
    n = append_to_ann_index(spark, delta, table="annx_incr")
    assert n == e.filter(F.col("vec_id") >= 300).count()

    incr = {
        tuple(r)
        for r in probe_ann_index(spark, queries, table="annx_incr").collect()
    }
    assert incr == full


def test_ann_vacuum_compacts_and_preserves_probe(spark):
    """VERDICT r9 #5 (ANN side): build over a slice, frozen-quantizer
    append of the rest, inject a superseded generation, vacuum — stale
    rows dropped, file sets compacted, probe identical, bucket spec
    preserved through the catalog rename."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_data_file_count,
        _table_num_buckets,
        append_to_ann_index,
        vacuum_ann_index,
    )

    t = "test_ann_idx_vac"
    try:
        e = load(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        build_ann_index(
            spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
            vectors=e.filter(F.col("vec_id") < 250),
        )
        append_to_ann_index(spark, e.filter(F.col("vec_id") >= 250), table=t)
        q = _queries(spark)
        clean = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        stale = (
            spark.table(t).limit(23)
            .withColumn("build_id", F.lit("superseded-build"))
        )
        (
            stale.write.bucketBy(8, "cell").sortBy("cell")
            .format("parquet").mode("append").saveAsTable(t)
        )
        # stale duplicates are not harmless: duplicate index rows can
        # displace distinct vectors from the top-k, so a corrupted index
        # SERVES WRONG NEIGHBORS — this is what makes vacuum a
        # correctness op, not just a file-count op
        corrupted = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        assert corrupted != clean
        files_before = _table_data_file_count(spark, t)
        stats = vacuum_ann_index(spark, table=t)
        assert stats["rows_dropped"] == 23
        assert stats["files_after"] < files_before
        assert _table_num_buckets(spark, t) == 8
        after = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        assert after == clean and after
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_vacuum_retry_after_crash_window_recovers_not_destroys(spark):
    """A crash between vacuum's DROP and RENAME leaves the sole copy in
    __vacuum_tmp; re-running vacuum (the natural operator response) must
    COMPLETE the rename and preserve every row — not clear the tmp table
    and destroy the index."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        vacuum_ann_index,
    )

    t = "test_ann_idx_crash"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        rows = spark.table(t).count()
        q = _queries(spark)
        expected = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        # simulate the crash window: the compacted copy sits in tmp, the
        # base table was dropped, the rename never ran
        spark.table(t).write.format("parquet").saveAsTable(f"{t}__vacuum_tmp")
        spark.sql(f"DROP TABLE {t}")

        stats = vacuum_ann_index(spark, table=t)
        assert stats.get("recovered_from_interrupted_vacuum") is True
        assert stats["rows_dropped"] == 0 and stats["rows_kept"] == rows
        got = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        assert got == expected
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_vacuum_recovery_refuses_stale_generation_tmp(spark):
    """ADVICE r10: the interrupted-vacuum recovery branch must validate
    the tmp's build_id before publishing it — a __vacuum_tmp stranded by
    a vacuum of an OLDER generation (index rebuilt since) must not be
    renamed over the current index's name."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        vacuum_ann_index,
    )

    t = "test_ann_idx_staletmp"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        # simulate: an old vacuum's tmp (stale generation) survives, the
        # base table is gone (the DROP ran), codebooks declare CURRENT
        (
            spark.table(t)
            .withColumn("build_id", F.lit("stale-generation"))
            .write.format("parquet")
            .saveAsTable(f"{t}__vacuum_tmp")
        )
        spark.sql(f"DROP TABLE {t}")
        with pytest.raises(ValueError, match="stale-generation"):
            vacuum_ann_index(spark, table=t)
        # the refusal must leave the tmp (the only copy of SOMETHING)
        # untouched for the operator to inspect
        assert spark.catalog.tableExists(f"{t}__vacuum_tmp")
        assert not spark.catalog.tableExists(t)
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_vacuum_recovery_reports_tmp_file_count_before_rename(spark):
    """ADVICE r10: the recovery report's files_before used to be counted
    AFTER the rename (always equal to files_after). It is now None (the
    pre-vacuum input count is unknowable — the original table is gone)
    and files_after is the tmp's actual file count, measured pre-rename."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_data_file_count,
        vacuum_ann_index,
    )

    t = "test_ann_idx_recofiles"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        spark.table(t).write.format("parquet").saveAsTable(f"{t}__vacuum_tmp")
        spark.sql(f"DROP TABLE {t}")
        stats = vacuum_ann_index(spark, table=t)
        assert stats["recovered_from_interrupted_vacuum"] is True
        assert stats["files_before"] is None
        assert stats["files_after"] == _table_data_file_count(spark, t) > 0
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_cli_vacuum_index_ann_dry_run_and_run(spark, capsys):
    """VERDICT r10 #5 (ANN side): CLI dry run reports the generations and
    file count without writes; the real run compacts and preserves
    probe top-k exactly."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark import table_cli
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_data_file_count,
    )

    t = "test_ann_idx_cli"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        q = _queries(spark)
        before = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        files = _table_data_file_count(spark, t)

        assert table_cli.main(["vacuum-index", t, "--kind", "ann", "--dry-run"]) == 0
        dry = _json.loads(capsys.readouterr().out.strip())
        assert dry["dry_run"] is True
        side = dry["sides"][t]
        assert side["generations_to_drop"] == [] and side["rows_to_drop"] == 0
        assert side["data_files"] == files
        assert list(side["generations"]) == [dry["current_build_id"]]

        assert table_cli.main(["vacuum-index", t, "--kind", "ann"]) == 0
        out = _json.loads(capsys.readouterr().out.strip())
        assert out["stats"]["rows_dropped"] == 0
        after = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True
            ).collect()
        }
        assert after == before and after
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_verify_ann_index_detects_duplicates_and_stranded_generations(spark):
    """r11 lifecycle symmetry: verify_ann_index is the deterministic
    integrity report for the codes table — duplicate vec_ids (the
    top-k-displacing corruption of a double-append) and stranded
    build generations (rows encoded against a superseded quantizer),
    both healed by vacuum."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_num_buckets,
        vacuum_ann_index,
        verify_ann_index,
    )

    t = "test_ann_idx_verify"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        rep = verify_ann_index(spark, table=t)
        assert rep["consistent"] and rep["current_generation_only"]
        assert rep["stranded_build_ids"] == []

        n_buckets = _table_num_buckets(spark, t)
        # double-append: re-land 25 existing rows byte-identically
        dup = spark.table(t).filter(F.col("vec_id") < 25)
        (
            dup.write.bucketBy(n_buckets, "cell")
            .sortBy("cell")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rep = verify_ann_index(spark, table=t)
        assert not rep["consistent"] and rep["duplicate_code_vecids"] == 25
        assert rep["current_generation_only"]  # same build, still one gen

        # stranded generation: rows from a superseded build
        stale = (
            spark.table(t)
            .filter((F.col("vec_id") >= 25) & (F.col("vec_id") < 40))
            .withColumn("build_id", F.lit("superseded-build"))
        )
        (
            stale.write.bucketBy(n_buckets, "cell")
            .sortBy("cell")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rep = verify_ann_index(spark, table=t)
        assert rep["stranded_build_ids"] == ["superseded-build"]
        assert not rep["current_generation_only"]
        # ANN stranded rows ARE corruption (garbage ADC distances can
        # displace true neighbors), unlike the minhash report's split
        assert not rep["consistent"]
        # VERDICT r11 wrong #1: the duplicate count is scoped to the
        # CURRENT generation — the stranded rows 25..39 must not
        # double-count as duplicates; the field stays at the 25 rows the
        # double-append landed, so each field isolates one corruption
        # class
        assert rep["duplicate_code_vecids"] == 25

        vacuum_ann_index(spark, table=t)
        rep = verify_ann_index(spark, table=t)
        assert rep["consistent"] and rep["current_generation_only"]
        assert rep["duplicate_code_vecids"] == 0
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_verify_duplicate_count_zero_on_stranded_only_table(spark):
    """VERDICT r11 wrong #1 regression: a table whose ONLY corruption is
    a stranded generation must report duplicate_code_vecids == 0 — the
    old all-generations groupBy double-counted every shadowed vec_id as
    a duplicate, conflating the interrupted-rebuild and double-append
    corruption classes in the report."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _table_num_buckets,
        verify_ann_index,
    )

    t = "test_ann_idx_strandedonly"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        n_buckets = _table_num_buckets(spark, t)
        stale = (
            spark.table(t)
            .filter(F.col("vec_id") < 40)
            .withColumn("build_id", F.lit("superseded-build"))
        )
        (
            stale.write.bucketBy(n_buckets, "cell")
            .sortBy("cell")
            .format("parquet")
            .mode("append")
            .saveAsTable(t)
        )
        rep = verify_ann_index(spark, table=t)
        assert rep["duplicate_code_vecids"] == 0  # no double-append here
        assert rep["stranded_build_ids"] == ["superseded-build"]
        assert not rep["consistent"]  # stranded alone still flips it
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_vacuum_recovery_refuses_empty_tmp(spark):
    """ADVICE r11: an EMPTY __vacuum_tmp must never be published over the
    index name — the old `if tmp_builds and ...` guard skipped validation
    entirely on a zero-row tmp and renamed it into place, silently
    replacing the index with an empty table while reporting success."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        vacuum_ann_index,
    )

    t = "test_ann_idx_emptytmp"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        spark.table(t).limit(0).write.format("parquet").saveAsTable(
            f"{t}__vacuum_tmp"
        )
        spark.sql(f"DROP TABLE {t}")
        with pytest.raises(ValueError, match="EMPTY"):
            vacuum_ann_index(spark, table=t)
        # refusal leaves the tmp for inspection and publishes nothing
        assert spark.catalog.tableExists(f"{t}__vacuum_tmp")
        assert not spark.catalog.tableExists(t)
    finally:
        for side in ("", "__codebooks", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_refined_probe_survives_append_and_vacuum(spark):
    """r12 lifecycle coverage for the REFINED serving path: the exact
    rerank reads true vectors by vec_id, so it must be insensitive to
    how the underlying codes table was grown — probe_ann_index_refined
    over build(slice) + append(delta) + vacuum must equal the same probe
    over a fresh full build (and both must beat/equal the plain ADC
    probe's agreement with exact cosine order by construction)."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        append_to_ann_index,
        build_ann_index,
        probe_ann_index_refined,
        vacuum_ann_index,
    )

    tables = ("annx_ref_full", "annx_ref_grown")
    try:
        e = load(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
        )
        build_ann_index(
            spark, SF_DIR, table="annx_ref_full", n_buckets=8, n_cells=16
        )
        build_ann_index(
            spark, SF_DIR, table="annx_ref_grown", n_buckets=8, n_cells=16,
            vectors=e.filter(F.col("vec_id") < 300),
        )
        append_to_ann_index(
            spark, e.filter(F.col("vec_id") >= 300), table="annx_ref_grown"
        )
        vacuum_ann_index(spark, table="annx_ref_grown")

        def probe(t):
            return {
                tuple(r)
                for r in probe_ann_index_refined(
                    spark, q, e, table=t, nprobe=4, k=3, refine_depth=50,
                    exclude_self=True,
                ).collect()
            }

        assert probe("annx_ref_grown") == probe("annx_ref_full")
    finally:
        for t in tables:
            for side in ("", "__codebooks", "__vacuum_tmp"):
                spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_refine_depth_refused_below_expected_tie_mass(
    spark, ann_index, monkeypatch
):
    """VERDICT r12 #2, static guard: a caller-provided bound on the
    largest ADC-tie cluster refuses refine_depth < nprobe x bound up
    front (no job), naming the measured 0.39-at-R=30 failure mode; the
    env override permits a deliberate run past the bound."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        probe_ann_index_refined,
    )

    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    with pytest.raises(ValueError, match="expected_tie_cluster"):
        probe_ann_index_refined(
            spark, q, e, table=ann_index, nprobe=4, k=3, refine_depth=100,
            exclude_self=True, expected_tie_cluster=100,
        )
    monkeypatch.setenv("SPARK_GRAFT_REFINE_DEPTH_OVERRIDE", "1")
    rows = probe_ann_index_refined(
        spark, q, e, table=ann_index, nprobe=4, k=3, refine_depth=100,
        exclude_self=True, expected_tie_cluster=100,
    ).collect()
    assert len(rows) == 9


def test_refine_tie_truncation_detected_at_execution(spark):
    """VERDICT r12 #2, measured guard: on a corpus with an ADC-tie
    cluster larger than refine_depth (20 byte-identical vectors -> one
    PQ code -> exactly tied ADC distances), check_tie_truncation=True
    fails AT EXECUTION with the named error instead of silently
    returning tie-break-luck neighbors; with refine_depth covering the
    cluster the same probe passes and equals the unchecked probe."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        build_ann_index,
        probe_ann_index_refined,
    )

    table = "annx_tie_flood"
    try:
        e = load(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        base = e.filter(F.col("vec_id") < 16)
        clones = (
            e.filter(F.col("vec_id") == 0)
            .crossJoin(spark.range(100, 120).select(F.col("id")))
            .select(F.col("id").alias("vec_id"), "emb")
        )
        corpus = base.unionByName(clones)
        build_ann_index(
            spark, SF_DIR, table=table, n_buckets=4, n_cells=16,
            vectors=corpus,
        )
        q = e.filter(F.col("vec_id") == 0).select(
            F.lit(0).cast("bigint").alias("qid"), F.col("emb").alias("qemb")
        )
        truncated = probe_ann_index_refined(
            spark, q, corpus, table=table, nprobe=4, k=3, refine_depth=5,
            exclude_self=False, check_tie_truncation=True,
        )
        with pytest.raises(
            (SparkRuntimeException, Py4JJavaError), match="truncates a tie"
        ):
            truncated.collect()
        ok = probe_ann_index_refined(
            spark, q, corpus, table=table, nprobe=4, k=3, refine_depth=30,
            exclude_self=False, check_tie_truncation=True,
        ).collect()
        plain = probe_ann_index_refined(
            spark, q, corpus, table=table, nprobe=4, k=3, refine_depth=30,
            exclude_self=False,
        ).collect()
        assert {tuple(r) for r in ok} == {tuple(r) for r in plain}
        assert len(ok) == 3
    finally:
        for side in ("", "__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {table}{side}")


def test_cli_locks_and_refused_vacuum_exit_code(spark, ann_index, capsys):
    """r13 ops surface for the maintenance fence: `locks` lists a held
    lock with holder pid/host/liveness, and a scheduled `vacuum-index`
    colliding with a live append exits 3 (retry-later) with the named
    conflict as JSON — distinct from real failure, no traceback."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _maintenance_lock,
    )
    from wod_ascii_to_parquet_spark_spark.table_cli import main

    with _maintenance_lock(spark, ann_index, "append"):
        rc = main(["locks", ann_index])
        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert len(doc["locks"]) == 1
        row = doc["locks"][0]
        assert row["lock"].startswith("append.")
        assert row["holder_alive"] is True
        rc = main(["vacuum-index", ann_index, "--kind", "ann"])
        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 3
        assert "vacuum refused" in doc["refused"]
    # lock released: empty listing, vacuum succeeds
    rc = main(["locks", ann_index])
    doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and doc["locks"] == []
    rc = main(["vacuum-index", ann_index, "--kind", "ann"])
    assert rc == 0


def test_delete_masks_probe_and_vacuum_physically_reclaims(spark):
    """The takedown lifecycle (r13): delete_from_ann_index tombstones a
    set in O(|set|) without rewriting the codes table; every probe masks
    the tombstones (deleted vectors never surface); vacuum applies them
    to the layout (rows physically gone, sidecar cleared) with probe
    results unchanged — the mask and the reclaim must be equivalent."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        delete_from_ann_index,
        vacuum_ann_index,
        vacuum_ann_index_dry_run,
        verify_ann_index,
    )

    t = "test_ann_idx_del"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        q = _queries(spark)

        def probe():
            return {
                tuple(r)
                for r in probe_ann_index(
                    spark, q, table=t, nprobe=4, k=3, exclude_self=True
                ).collect()
            }

        clean = probe()
        rows_full = spark.table(t).count()
        e = load(spark, SF_DIR, "embeddings")
        victims = e.filter(F.col("vec_id") % 7 == 3).select("vec_id")
        n_victims = victims.count()
        n = delete_from_ann_index(spark, victims, table=t)
        assert n == n_victims
        masked = probe()
        deleted_ids = {r[0] for r in victims.collect()}
        assert not {r[1] for r in masked} & deleted_ids
        assert masked != clean  # a deleted neighbor was actually serving
        # each query still gets k results from the surviving corpus
        assert len(masked) == len(clean)
        # delete is O(sidecar): the codes table was NOT rewritten
        assert spark.table(t).count() == rows_full
        assert verify_ann_index(spark, t)["tombstoned_vec_ids"] == n_victims
        dry = vacuum_ann_index_dry_run(spark, t)
        assert dry["tombstones_to_reclaim"] == n_victims
        stats = vacuum_ann_index(spark, table=t)
        assert stats["tombstones_applied"] == n_victims
        assert stats["rows_dropped"] == n_victims
        assert spark.table(t).count() == rows_full - n_victims
        # sidecar cleared: its mass is now encoded in the layout itself
        assert not spark.catalog.tableExists(f"{t}__tombstones")
        assert probe() == masked
        assert verify_ann_index(spark, t)["tombstoned_vec_ids"] == 0
    finally:
        for side in ("", "__codebooks", "__tombstones", "__vacuum_tmp"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_delete_is_generation_scoped_rebuild_clears_tombstones(spark):
    """Tombstones die with the generation they masked: a rebuild encodes
    whatever corpus the caller passes, so carrying forward deletions of
    the PREVIOUS corpus would silently mask legitimate rows."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        delete_from_ann_index,
    )

    t = "test_ann_idx_del_gen"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)

        def probe_ids():
            return {
                r[1]
                for r in probe_ann_index(
                    spark, _queries(spark), table=t, nprobe=4, k=3,
                    exclude_self=True,
                ).collect()
            }

        victim = max(probe_ids())  # a vector that is actually serving
        delete_from_ann_index(
            spark,
            load(spark, SF_DIR, "embeddings")
            .filter(F.col("vec_id") == victim)
            .select("vec_id"),
            table=t,
        )
        gone = probe_ids()
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        assert not spark.catalog.tableExists(f"{t}__tombstones")
        back = probe_ids()
        assert victim not in gone and victim in back
    finally:
        for side in ("", "__codebooks", "__tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_delete_and_vacuum_fence_each_other(spark, ann_index):
    """The mutator class (r13): a delete inside a live vacuum refuses
    and vice versa (a tombstone written mid-vacuum would be cleared
    without its rows being dropped — silent resurrection); concurrent
    mutators (append + delete) stay allowed."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        IndexMaintenanceConflict,
        _maintenance_lock,
        delete_from_ann_index,
        vacuum_ann_index,
    )

    one = spark.range(1).select(F.lit(0).cast("bigint").alias("vec_id"))
    with _maintenance_lock(spark, ann_index, "vacuum"):
        with pytest.raises(IndexMaintenanceConflict, match="delete refused"):
            delete_from_ann_index(spark, one, table=ann_index)
    with _maintenance_lock(spark, ann_index, "delete"):
        with pytest.raises(IndexMaintenanceConflict, match="vacuum refused"):
            vacuum_ann_index(spark, table=ann_index)
        # mutators don't conflict with each other
        with _maintenance_lock(spark, ann_index, "append"):
            pass
    # fence released: tombstone lands, then clean it up via rebuild
    try:
        delete_from_ann_index(spark, one, table=ann_index)
    finally:
        build_ann_index(
            spark, SF_DIR, table=ann_index, n_buckets=8, n_cells=16
        )


def test_filtered_probe_is_prefilter_not_postfilter(spark):
    """Filtered ANN (r13): the metadata predicate applies to the
    candidate stream BEFORE top-k, so every query gets k results from
    the eligible subset; post-filtering the unfiltered top-k (the
    tempting wrong implementation) returns fewer rows and misses every
    eligible neighbor that ranked below an ineligible one."""
    t = "test_ann_idx_filt"
    try:
        emb = load(spark, SF_DIR, "embeddings")
        build_ann_index(
            spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
            attributes=emb.select("vec_id", "label"),
        )
        q = _queries(spark)
        filtered = probe_ann_index(
            spark, q, table=t, nprobe=4, k=3, exclude_self=True,
            candidate_filter="label % 2 = 0",
        ).collect()
        eligible = {
            r[0] for r in emb.filter(F.col("label") % 2 == 0)
            .select("vec_id").collect()
        }
        assert {r["vec_id"] for r in filtered} <= eligible
        # pre-filter: every query keeps its full k
        from collections import Counter

        per_q = Counter(r["qid"] for r in filtered)
        assert set(per_q.values()) == {3}
        # the post-filter strawman demonstrably loses results
        unfiltered = probe_ann_index(
            spark, q, table=t, nprobe=4, k=3, exclude_self=True
        ).collect()
        post = [r for r in unfiltered if r["vec_id"] in eligible]
        assert len(post) < len(filtered)
    finally:
        for side in ("", "__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_attributed_append_requires_and_carries_attributes(spark):
    """An index built with attribute columns must refuse a bare append
    (appended rows would NULL out of every candidate_filter — silently
    unfindable); with attributes supplied, slice-build + append serves
    filtered probes identically to a full attributed build."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        append_to_ann_index,
    )

    t, t2 = "test_ann_idx_attr", "test_ann_idx_attr_full"
    try:
        emb = load(spark, SF_DIR, "embeddings")
        e = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        attrs = emb.select("vec_id", "label")
        build_ann_index(
            spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
            vectors=e.filter(F.col("vec_id") < 250),
            attributes=attrs.filter(F.col("vec_id") < 250),
        )
        delta = e.filter(F.col("vec_id") >= 250)
        with pytest.raises(ValueError, match="attribute columns"):
            append_to_ann_index(spark, delta, table=t)
        append_to_ann_index(
            spark, delta, table=t,
            attributes=attrs.filter(F.col("vec_id") >= 250),
        )
        build_ann_index(
            spark, SF_DIR, table=t2, n_buckets=8, n_cells=16,
            attributes=attrs,
        )
        q = _queries(spark)

        def probe(table):
            return {
                tuple(r)
                for r in probe_ann_index(
                    spark, q, table=table, nprobe=4, k=3, exclude_self=True,
                    candidate_filter="label % 2 = 0",
                ).collect()
            }

        assert probe(t) == probe(t2)
    finally:
        for tbl in (t, t2):
            for side in ("", "__codebooks"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}{side}")


def test_duplicate_attribute_vec_ids_refused(spark):
    """build/append must refuse an attributes frame with duplicate vec_ids
    BEFORE the left join (ADVICE r13): a duplicate key multiplies index
    code rows, the duplicated candidate displaces distinct vectors from
    top-k, and differing attribute values defeat vacuum's full-row
    dropDuplicates — so it must never reach the table."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        append_to_ann_index,
    )

    t = "test_ann_idx_dupattr"
    try:
        emb = load(spark, SF_DIR, "embeddings")
        e = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        attrs = emb.select("vec_id", "label")
        dup_attrs = attrs.unionByName(
            attrs.filter(F.col("vec_id") < 5).withColumn(
                "label", F.col("label") + 1
            )
        )
        with pytest.raises(ValueError, match="duplicate vec_id"):
            build_ann_index(
                spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
                attributes=dup_attrs,
            )
        # clean build, then a duplicate-carrying append is refused too
        build_ann_index(
            spark, SF_DIR, table=t, n_buckets=8, n_cells=16,
            vectors=e.filter(F.col("vec_id") < 250),
            attributes=attrs.filter(F.col("vec_id") < 250),
        )
        delta = e.filter(F.col("vec_id") >= 250)
        with pytest.raises(ValueError, match="duplicate vec_id"):
            append_to_ann_index(
                spark, delta, table=t,
                attributes=dup_attrs.filter(F.col("vec_id") >= 250)
                .unionByName(attrs.filter(F.col("vec_id") == 250)),
            )
    finally:
        for side in ("", "__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_cli_delete_index_tombstones_and_refusal_exit_code(spark, capsys):
    """r13 ops surface for takedowns: `delete-index` tombstones ids from
    a shell (a compliance runbook doesn't import plans/*), probes stop
    serving them immediately, and a collision with a live vacuum exits 3
    (retry-later) with the named conflict as JSON."""
    import json as _json

    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        _maintenance_lock,
    )
    from wod_ascii_to_parquet_spark_spark.table_cli import main

    t = "test_ann_idx_cli_del"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        serving = {
            r[1]
            for r in probe_ann_index(
                spark, _queries(spark), table=t, nprobe=4, k=3,
                exclude_self=True,
            ).collect()
        }
        victim = max(serving)
        rc = main(["delete-index", t, "--kind", "ann", "--ids", str(victim)])
        doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and doc["tombstoned"] == 1
        after = {
            r[1]
            for r in probe_ann_index(
                spark, _queries(spark), table=t, nprobe=4, k=3,
                exclude_self=True,
            ).collect()
        }
        assert victim not in after
        with _maintenance_lock(spark, t, "vacuum"):
            rc = main(["delete-index", t, "--kind", "ann", "--ids", "1"])
            doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
            assert rc == 3 and "delete refused" in doc["refused"]
        rc = main(["delete-index", t, "--kind", "ann", "--ids", "x,y"])
        assert rc == 2
    finally:
        for side in ("", "__codebooks", "__tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_tombstone_mask_is_broadcast_anti_join_in_plan(spark):
    """The takedown mask must stay a BROADCAST anti-join on the
    candidate stream — a shuffled anti-join would re-exchange the 100 TB
    codes side on every probe for a sidecar-sized delete set."""
    from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
        delete_from_ann_index,
    )

    t = "test_ann_idx_plan_tomb"
    try:
        import re

        def plan_of(df):
            return df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )

        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        plan_unmasked = plan_of(
            probe_ann_index(
                spark, _queries(spark), table=t, nprobe=4, k=3,
                exclude_self=True,
            )
        )
        delete_from_ann_index(
            spark,
            load(spark, SF_DIR, "embeddings")
            .filter(F.col("vec_id") % 11 == 0)
            .select("vec_id"),
            table=t,
        )
        plan = plan_of(
            probe_ann_index(
                spark, _queries(spark), table=t, nprobe=4, k=3,
                exclude_self=True,
            )
        )
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti, plan[:4000]
        assert any("BroadcastHashJoin" in ln for ln in anti), plan[:4000]
        assert "LeftAnti" not in plan_unmasked
        # the mask adds exactly ONE shuffle Exchange and it is on the
        # TOMBSTONE side (the sidecar's distinct() for idempotent
        # re-deletes — tombstone-sized); the codes side joins broadcast,
        # so the 100 TB side is never re-exchanged by a takedown
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        n_ex_unmasked = len(re.findall(r"\(\d+\) Exchange", plan_unmasked))
        assert n_ex == n_ex_unmasked + 1, (n_ex, n_ex_unmasked)
        # attribution: the added exchange is the sidecar's distinct —
        # it hash-partitions on vec_id and feeds the BroadcastExchange
        # of the anti-join's build side (formatted plans put the
        # partitioning on the node's Arguments line)
        assert "hashpartitioning(vec_id" in plan, plan[:4000]
        assert "hashpartitioning(vec_id" not in plan_unmasked
    finally:
        for side in ("", "__codebooks", "__tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")


def test_join_tier_probe_index_side_exchange_free(spark):
    """The large-batch tier (broadcast_queries=False): the cell join is
    a sort-merge join whose BUCKETED index side enters with no Exchange
    (the build shuffle paid once), and results equal the broadcast tier
    row-for-row — tier choice is physical, never semantic."""
    import re

    t = "test_ann_idx_join_tier"
    try:
        build_ann_index(spark, SF_DIR, table=t, n_buckets=8, n_cells=16)
        q = _queries(spark)
        df = probe_ann_index(
            spark, q, table=t, nprobe=4, k=3, exclude_self=True,
            broadcast_queries=False,
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan, plan[:4000]
        assert "Bucketed: true" in plan, plan[:4000]
        # the index scan's subtree reaches the merge join without an
        # Exchange: bucket pruning text appears and the scan's section
        # shows SelectedBucketsCount
        assert "SelectedBucketsCount" in plan, plan[:4000]
        got = {tuple(r) for r in df.collect()}
        want = {
            tuple(r)
            for r in probe_ann_index(
                spark, q, table=t, nprobe=4, k=3, exclude_self=True,
            ).collect()
        }
        assert got == want and got
    finally:
        for side in ("", "__codebooks"):
            spark.sql(f"DROP TABLE IF EXISTS {t}{side}")
