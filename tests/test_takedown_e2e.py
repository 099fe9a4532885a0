"""Cross-surface takedown (GDPR / right-to-be-forgotten) integration:
one takedown set applied to EVERY storage surface the engine writes —
the manifest-log table (copy-on-write delete), the MinHash signature
index (tombstone), and the IVFADC ANN index (tombstone) — must remove
the entity from every serving path, both immediately (logical mask) and
after vacuum (physical reclaim). Each surface's delete is pinned in its
own test file; this scenario pins that the SURFACES AGREE: an id taken
down once disappears everywhere, with no surface silently resurrecting
it after maintenance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.plans.ann_index import (
    build_ann_index,
    delete_from_ann_index,
    probe_ann_index,
    vacuum_ann_index,
)
from wod_ascii_to_parquet_spark_spark.plans.minhash_index import (
    build_minhash_index,
    delete_from_minhash_index,
    probe_minhash_index,
    vacuum_minhash_index,
)
from wod_ascii_to_parquet_spark_spark.registry import load
from wod_ascii_to_parquet_spark_spark.sources.lakehouse import LogTable

from .conftest import SF_DIR

MH_TABLE = "takedown_mh_idx"
ANN_TABLE = "takedown_ann_idx"


def _assert_gone(spark, t: LogTable, gone: set[int]) -> None:
    # surface 1: the log table serves no deleted row
    alive = {r.doc_id for r in t.read().select("doc_id").collect()}
    assert not (alive & gone)
    # surface 2: the signature index generates no candidate whose INDEX
    # side is deleted (batch side is caller data — allowed by contract)
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    pairs = probe_minhash_index(
        spark, d, table=MH_TABLE, self_probe=True
    ).collect()
    assert not ({p["doc_a"] for p in pairs} & gone)
    # surface 3: the ANN index never serves a deleted vector
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    q = e.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qemb")
    )
    served = probe_ann_index(
        spark, q, table=ANN_TABLE, nprobe=4, k=3, exclude_self=True
    ).collect()
    assert not ({r["vec_id"] for r in served} & gone)
    # every surviving query still gets its full k from the live corpus
    by_q: dict[int, int] = {}
    for r in served:
        by_q[r["qid"]] = by_q.get(r["qid"], 0) + 1
    assert all(n == 3 for n in by_q.values())


def test_takedown_applies_across_all_surfaces(spark, tmp_path):
    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load(spark, SF_DIR, "embeddings")
    gone = {
        r.doc_id
        for r in d.filter(F.col("doc_id") % 17 == 3)
        .select("doc_id")
        .collect()
    }
    assert gone  # the scenario must actually delete something
    try:
        t = LogTable(spark, str(tmp_path / "docs"))
        t.write(d, mode="overwrite")
        build_minhash_index(spark, d, table=MH_TABLE, family="md5")
        build_ann_index(
            spark, SF_DIR, table=ANN_TABLE, n_buckets=8, n_cells=16
        )

        # the takedown, surface by surface
        t.delete_where("doc_id % 17 = 3")
        delete_from_minhash_index(
            spark,
            d.filter(F.col("doc_id") % 17 == 3).select("doc_id"),
            table=MH_TABLE,
        )
        delete_from_ann_index(
            spark,
            emb.filter(F.col("vec_id") % 17 == 3).select("vec_id"),
            table=ANN_TABLE,
        )

        # logical mask: gone everywhere immediately
        _assert_gone(spark, t, gone)

        # physical reclaim must not resurrect or over-delete
        t.vacuum(keep_versions=1, min_age_seconds=0)
        vacuum_minhash_index(spark, table=MH_TABLE)
        vacuum_ann_index(spark, table=ANN_TABLE)
        _assert_gone(spark, t, gone)
        # after vacuum the ANN tombstone sidecar is applied+cleared, and
        # the codes table physically lacks the deleted rows
        left = {
            r["vec_id"]
            for r in spark.table(ANN_TABLE).select("vec_id").collect()
        }
        assert not (left & gone)
    finally:
        for tbl in (MH_TABLE, ANN_TABLE):
            for side in ("", "__codebooks", "__tombstones", "__pairs"):
                spark.sql(f"DROP TABLE IF EXISTS {tbl}{side}")


def test_redaction_update_where_unrecoverable_after_vacuum(spark, tmp_path):
    """GDPR RECTIFICATION — the update_where twin of erasure (VERDICT
    r14 #5): redact a victim's text via copy-on-write UPDATE, vacuum,
    and pin that (a) the row SURVIVES with the sentinel, (b) the
    pre-redaction bytes are PHYSICALLY gone from every data file under
    the table directory, and (c) time-travel to the pre-redaction
    snapshot can no longer serve the secret. The physical check is
    self-validating: before vacuum the secret bytes must be FINDABLE in
    some parquet file (so compression/encoding cannot green-wash the
    after-vacuum assertion)."""
    import pathlib

    t = LogTable(spark, str(tmp_path / "docs"))
    secret = "XXSECRET-PII-PAYLOADXX"
    t.write(
        spark.createDataFrame(
            [
                (1, "an ordinary document"),
                (2, f"holds {secret} verbatim"),
                (3, "another ordinary document"),
            ],
            "doc_id bigint, text string",
        ),
        mode="overwrite",
    )
    v0 = t.latest_version()
    rep = t.update_where(
        f"text LIKE '%{secret}%'", {"text": "'[REDACTED]'"}
    )
    assert rep["rows_updated"] == 1

    def files():
        return list(pathlib.Path(str(tmp_path / "docs")).rglob("*.parquet"))

    # the secret is findable on disk pre-vacuum (replaced file still
    # present for time travel) — validates the byte-scan itself
    assert any(secret.encode() in p.read_bytes() for p in files())
    assert any(
        secret in r.text for r in t.read(version=v0).collect()
    )
    # rectified current state: row count preserved, value replaced
    got = {(r.doc_id, r.text) for r in t.read().collect()}
    assert (2, "[REDACTED]") in got and len(got) == 3

    t.vacuum(keep_versions=1, min_age_seconds=0)

    # row still present post-vacuum, and the bytes are gone EVERYWHERE
    got = {(r.doc_id, r.text) for r in t.read().collect()}
    assert (2, "[REDACTED]") in got and len(got) == 3
    assert files(), "vacuum must not reclaim the live files"
    for p in files():
        assert secret.encode() not in p.read_bytes(), p
    # pre-redaction snapshot: refused or secret-free — unrecoverable
    # through the table's own read path either way
    try:
        old = [r.text for r in t.read(version=v0).collect()]
    except Exception:
        old = []
    assert not any(secret in x for x in old)
