"""End-to-end curation job: the written corpus must agree with the
fully-oracled `curation_pipeline_stats` query, the layout must be the
shard-partitioned training shape, and the run must be deterministic."""

from __future__ import annotations

import json
import os

import pytest

from wod_ascii_to_parquet_spark_spark.plans.curate import (
    STATS_FILE,
    curate_corpus,
)
from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("curated") / "corpus")
    stats = curate_corpus(spark, SF_DIR, out)
    return out, stats


def test_layout_and_markers(curated):
    out, stats = curated
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert os.path.exists(os.path.join(out, STATS_FILE))
    shards = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert 1 <= len(shards) <= stats["n_shards"]
    with open(os.path.join(out, STATS_FILE)) as fh:
        assert json.load(fh) == stats


def test_stats_match_oracled_query(spark, curated):
    """The job's sidecar stats must equal the registered (DuckDB-oracled)
    pipeline-stats query row — the job IS the query plus a write."""
    _, stats = curated
    row = (
        load_all_operators()["curation_pipeline_stats"]
        .fn(spark, SF_DIR)
        .first()
        .asDict()
    )
    for k, v in row.items():
        assert stats[k] == int(v), k


def test_written_corpus_consistency(spark, curated):
    out, stats = curated
    df = spark.read.parquet(out)
    rows = df.count()
    assert rows == stats["n_kept"]
    agg = df.selectExpr(
        "sum(ntok) AS tok",
        "min(doc_id) AS min_id",
        "count(DISTINCT text) AS n_texts",
        "max(bin) AS max_bin",
    ).first()
    assert int(agg["tok"]) == stats["tok_kept"]
    # eval docs excluded; exact dups impossible by construction
    assert agg["min_id"] >= 20
    assert agg["n_texts"] == rows
    # packing: bins are dense-ish under the budget (every shard's max bin
    # is bounded by its token total / budget)
    per_shard = df.groupBy("shard").agg(
        {"ntok": "sum", "bin": "max"}
    ).collect()
    for r in per_shard:
        assert r["max(bin)"] <= r["sum(ntok)"] // stats["pack_budget"] + 1


def test_deterministic_rerun(spark, curated, tmp_path):
    _, stats = curated
    out2 = str(tmp_path / "corpus2")
    stats2 = curate_corpus(spark, SF_DIR, out2)
    assert stats2 == stats
