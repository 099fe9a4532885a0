"""Refusal guards on the labeled non-default REFERENCE arms (VERDICT
r10 #2): `dedup_embedding_ann_catalyst`, `dedup_semdedup_prune_catalyst`,
`vector_pq_encode_catalyst` (interpreted-HOF row budgets) and
`dedup_simhash64_seg4` (saturating 2^16 candidate bucket space). Each
arm exists only as a cross-engine bit-pin of a routed headline tier; a
naive 100x invocation must fail fast NAMING that headline tier, and the
env override must permit a deliberate reference-pin run. Default-budget
behavior (oracles unchanged) is covered by test_oracle_parity.py, which
re-runs the three oracled arms against DuckDB every suite run."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.operators.dedup import (
    ReferenceArmBudgetExceeded,
)
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

from .conftest import SF_DIR

QUERIES = load_all_operators()

#: (arm, env var that bounds it, headline tier the refusal must name).
#: The catalyst arms are bounded by PER-ARM vars (ADVICE r11: the shared
#: SPARK_GRAFT_CATALYST_ROW_BUDGET is a raise-only floor and can never
#: lower a budget — tested separately below).
GUARDED = [
    (
        "dedup_embedding_ann_catalyst",
        "SPARK_GRAFT_CATALYST_ROW_BUDGET_KERNEL",
        "dedup_embedding_ann",
    ),
    (
        "dedup_semdedup_prune_catalyst",
        "SPARK_GRAFT_CATALYST_ROW_BUDGET_KERNEL",
        "dedup_semdedup_prune",
    ),
    (
        "vector_pq_encode_catalyst",
        "SPARK_GRAFT_CATALYST_ROW_BUDGET_ENCODE",
        "vector_pq_encode",
    ),
    (
        "dedup_simhash64_seg4",
        "SPARK_GRAFT_SIMHASH_CAND_BUDGET",
        "dedup_simhash64",
    ),
]


@pytest.mark.parametrize("arm,env,headline", GUARDED)
def test_reference_arm_refuses_past_budget(spark, monkeypatch, arm, env, headline):
    """Budget forced to 0: the arm must refuse BEFORE launching its
    expensive stage, and the message must route the user to the headline
    tier and the override knob."""
    monkeypatch.setenv(env, "0")
    with pytest.raises(ReferenceArmBudgetExceeded) as exc:
        # guards run a cheap count eagerly inside the query fn — no
        # action on the returned frame is needed to trigger them
        QUERIES[arm].fn(spark, SF_DIR)
    msg = str(exc.value)
    assert headline in msg and env in msg, msg


@pytest.mark.parametrize("arm,env,headline", GUARDED)
def test_reference_arm_runs_under_default_budget(
    spark, monkeypatch, arm, env, headline
):
    """Default budgets must leave the fixture-scale reference arms
    runnable (the driver's sf0.01 correctness runs and the bit-pin role
    depend on it)."""
    monkeypatch.delenv(env, raising=False)
    assert QUERIES[arm].fn(spark, SF_DIR).count() >= 0


def test_env_override_permits_deliberate_run(spark, monkeypatch):
    """The documented escape hatch: an explicit huge budget admits the
    run even when the default would refuse (simulated by checking a
    tiny-default refusal flips under the override)."""
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_CAND_BUDGET", "0")
    with pytest.raises(ReferenceArmBudgetExceeded):
        QUERIES["dedup_simhash64_seg4"].fn(spark, SF_DIR)
    monkeypatch.setenv("SPARK_GRAFT_SIMHASH_CAND_BUDGET", str(1 << 60))
    assert QUERIES["dedup_simhash64_seg4"].fn(spark, SF_DIR).count() >= 0


def test_shared_catalyst_override_is_raise_only(spark, monkeypatch):
    """ADVICE r11: the shared SPARK_GRAFT_CATALYST_ROW_BUDGET must act
    as max(override, per-arm default) — setting it BELOW an arm's
    default (e.g. 0) must not make that arm start refusing, so a
    deliberate raise for one arm can never silently shrink another's
    budget. Fixture scale (500 vectors) is under every default, so the
    arm must still run."""
    monkeypatch.delenv("SPARK_GRAFT_CATALYST_ROW_BUDGET_KERNEL", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CATALYST_ROW_BUDGET", "0")
    assert QUERIES["dedup_embedding_ann_catalyst"].fn(spark, SF_DIR).count() >= 0


def test_per_arm_catalyst_override_wins_over_shared(spark, monkeypatch):
    """The per-arm var wins outright (it CAN lower, for tests and for
    deliberately tightening one arm): with the shared floor set huge,
    a per-arm 0 still refuses."""
    monkeypatch.setenv("SPARK_GRAFT_CATALYST_ROW_BUDGET", str(1 << 60))
    monkeypatch.setenv("SPARK_GRAFT_CATALYST_ROW_BUDGET_KERNEL", "0")
    with pytest.raises(ReferenceArmBudgetExceeded):
        QUERIES["dedup_embedding_ann_catalyst"].fn(spark, SF_DIR)


def test_minhash_hot_bucket_bound_refuses_identical_doc_flood(
    spark, monkeypatch
):
    """VERDICT r12 #3: a band bucket of m docs joins into C(m,2) pairs
    in ONE task, so an identical-document flood (the normal shape of
    crawl data) turns the subquadratic band join quadratic in its
    hottest bucket. A synthetic flood — 40 byte-identical documents,
    every band bucket = the whole corpus — must fail AT EXECUTION with
    the named contract (route byte-identical docs through dedup_exact
    first) once the bound is below the flood, and pass untouched when
    the bound covers it."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from wod_ascii_to_parquet_spark_spark.operators.dedup import (
        _lsh_verified_pairs,
        minhash_signature,
        shingle_hashes,
        shingles,
    )

    flood = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same document text repeated verbatim across the corpus "
            "many times over and over again"
        ).alias("text"),
    )
    s = (
        flood.select("doc_id", shingles(F.col("text")).alias("sh"))
        .withColumn("hashes", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
        .persist()
    )
    try:
        monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "10")
        with pytest.raises(
            (SparkRuntimeException, Py4JJavaError), match="dedup_exact"
        ):
            _lsh_verified_pairs(s).collect()
        monkeypatch.setenv("SPARK_GRAFT_MINHASH_BUCKET_BOUND", "4096")
        pairs = _lsh_verified_pairs(s).collect()
        # 40 identical docs: all C(40,2) pairs verify at jaccard 1.0
        assert len(pairs) == 40 * 39 // 2
        assert all(r["jac"] == 1.0 for r in pairs)
    finally:
        s.unpersist()


def test_minhash_bucket_bound_default_admits_fixture_corpus(spark):
    """The default 4096 bound must be invisible on real fixtures
    (measured band-bucket max: 11 at sf0.1, 16 at sf1): the oracled md5
    arm still returns its full verified pair set with the guard in the
    plan."""
    assert QUERIES["dedup_minhash_lsh_md5"].fn(spark, SF_DIR).count() > 0
