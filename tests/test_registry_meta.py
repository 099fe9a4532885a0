"""Registry hygiene: every query documented, every oracle well-formed."""

from __future__ import annotations

import re

from wod_ascii_to_parquet_spark_spark.registry import TABLES, load_all_operators

QUERIES = load_all_operators()


def test_every_query_has_doc_and_tags():
    for name, q in QUERIES.items():
        assert q.doc.strip(), f"{name} has no docstring"
        assert q.tags, f"{name} has no tags"


def test_rows_only_queries_tagged():
    for name, q in QUERIES.items():
        if q.oracle is None:
            assert "rows-only" in q.tags, f"{name} lacks rows-only tag"


def test_oracles_reference_known_tables_only():
    # conservative: any FROM/JOIN identifier must be a known view, a
    # subquery alias, VALUES, range(), or unnest()
    ident = re.compile(r"\b(?:FROM|JOIN)\s+([a-zA-Z_][a-zA-Z0-9_]*)", re.I)
    allowed = set(TABLES) | {"range", "unnest"}
    for name, q in QUERIES.items():
        if not q.oracle:
            continue
        for m in ident.finditer(q.oracle):
            tok = m.group(1).lower()
            # CTE names: collect WITH aliases
            ctes = {
                c.lower()
                for c in re.findall(
                    # WITH [RECURSIVE] name[(col, ...)] AS [MATERIALIZED] (
                    #   |   , name ... AS [MATERIALIZED] (
                    r"(?:WITH(?:\s+RECURSIVE)?|,)\s*([a-zA-Z_][a-zA-Z0-9_]*)"
                    r"\s*(?:\([^)]*\))?\s+AS\s*(?:MATERIALIZED\s*)?\(",
                    q.oracle,
                    re.I,
                )
            }
            assert tok in allowed | ctes or tok in {"lateral"}, (
                f"{name}: oracle references unknown table {tok!r}"
            )


def test_query_names_are_stable_identifiers():
    for name in QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_sample_rotation_orders_unverified_first():
    """load_all_operators orders oracled-but-never-green queries first so
    the driver's fixed-size sample prefix rotates coverage across rounds."""
    import json
    import pathlib

    from wod_ascii_to_parquet_spark_spark.registry import (
        VERIFY_FIRST,
        load_all_operators,
    )

    qs = load_all_operators()
    names = list(qs)
    green = set()
    for p in pathlib.Path(__file__).resolve().parents[1].glob(
        "CORRECTNESS_r*.json"
    ):
        for name, res in json.loads(p.read_text()).items():
            if isinstance(res, dict) and res.get("hash_match"):
                green.add(name)
    # VERIFY_FIRST names re-check first even when a past round was green
    # (their oracle/implementation changed since) — exclude from the
    # sorts-last expectation.
    green -= set(VERIFY_FIRST)
    if not green:  # no driver history yet — any order is fine
        return
    first_green = min(
        (names.index(n) for n in green if n in names), default=len(names)
    )
    # every oracled query that is NOT yet green must sort before ALL greens
    for i, n in enumerate(names):
        if qs[n].oracle is not None and n not in green:
            assert i < first_green, (n, i, first_green)


def test_cached_frames_bounds_cache_entries(spark):
    """Long-lived-session hygiene: registered queries that persist()
    barrier frames are session-scoped by design; `cached_frames()` is the
    documented scope that releases them per invocation. N repeated
    invocations inside the scope must leave the CacheManager EMPTY each
    time (bounded at 0 retained entries); the unscoped control run shows
    the leak the scope exists to stop."""
    from wod_ascii_to_parquet_spark_spark.registry import (
        QUERIES,
        cached_frames,
    )

    from .conftest import SF_DIR

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    for _ in range(3):
        with cached_frames():
            assert QUERIES["dedup_minhash_lsh"].fn(spark, SF_DIR).count() >= 0
        assert cm.isEmpty(), "scope failed to release persisted frames"
    # control: the same query unscoped leaves its barrier frame cached
    QUERIES["dedup_minhash_lsh"].fn(spark, SF_DIR).count()
    assert not cm.isEmpty()
    spark.catalog.clearCache()


def test_cached_frames_overlapping_scopes_never_corrupt_patch(spark):
    """Two scopes overlapping in non-LIFO order (concurrent convert()
    runs, or convert + table_cli on one session) must neither leak the
    tracking patch nor leave frames cached: the single-patch scope stack
    releases every frame once both scopes have closed, and
    DataFrame.persist is restored to the original afterwards."""
    import threading

    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.registry import cached_frames

    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:
        from pyspark.sql import DataFrame as _DF

    orig_persist = _DF.persist
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()

    a_open = threading.Event()
    b_done = threading.Event()
    a_close = threading.Event()

    def scope_a():
        with cached_frames():
            spark.range(70).withColumn("x", F.col("id") + 1).persist().count()
            a_open.set()
            b_done.wait(30)  # hold A open while B opens AND closes: non-LIFO
            a_close.wait(5)

    def scope_b():
        a_open.wait(30)
        with cached_frames():
            spark.range(71).withColumn("y", F.col("id") * 3).persist().count()
        b_done.set()

    ta = threading.Thread(target=scope_a)
    tb = threading.Thread(target=scope_b)
    ta.start(); tb.start()
    tb.join(60); a_close.set(); ta.join(60)
    assert not ta.is_alive() and not tb.is_alive()
    # patch fully removed, no stale tracking closure
    assert _DF.persist is orig_persist
    # every frame released once all scopes closed (attribution between
    # overlapping scopes may be approximate; release must not be)
    assert cm.isEmpty()
    # and persists AFTER all scopes closed are untracked (control)
    spark.range(11).persist().count()
    assert not cm.isEmpty()
    spark.catalog.clearCache()


def test_cached_frames_nested_scopes_release_only_their_own(spark):
    from pyspark.sql import functions as F

    from wod_ascii_to_parquet_spark_spark.registry import cached_frames

    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    with cached_frames():
        outer = spark.range(100).withColumn("x", F.col("id") * 2).persist()
        outer.count()
        with cached_frames():
            inner = spark.range(50).persist()
            inner.count()
        # inner released, outer still cached
        assert not cm.isEmpty()
    assert cm.isEmpty()


def test_cached_frames_empty_scopes_removed_by_identity(spark):
    """Two live EMPTY scopes compare equal as lists; closing the inner
    one must remove ITS list (identity), not the first equal one. With
    equality-based removal (the r10 bug) the sequence below popped the
    OUTER scope's list, attributed the later persist to the dead inner
    list (frame never released), and the outer exit raised ValueError
    from its finally block — leaving DataFrame.persist permanently
    patched with a non-empty dead stack."""
    from wod_ascii_to_parquet_spark_spark.registry import cached_frames

    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:
        from pyspark.sql import DataFrame as _DF

    orig_persist = _DF.persist
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()

    outer = cached_frames()
    outer_list = outer.__enter__()
    inner = cached_frames()
    inner.__enter__()
    # both scopes still empty → the two recording lists compare equal
    inner.__exit__(None, None, None)
    # persist AFTER the inner closed: must land in the still-live outer
    spark.range(37).persist().count()
    assert len(outer_list) == 1, "persist mis-attributed to a dead scope"
    # outer exit must not raise and must release the frame + the patch
    outer.__exit__(None, None, None)
    assert _DF.persist is orig_persist
    assert cm.isEmpty()


def test_coverage_header_counts_match_registry():
    """VERDICT r10 #3: COVERAGE.md's headline counts (total / oracled /
    rows-only) drifted twice across rounds; pin them to the registry so
    any future registration updates the doc or fails the suite."""
    import pathlib
    import re

    text = (
        pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    ).read_text()
    m = re.search(
        r"(\d+) registered queries \((\d+) with full DuckDB oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md header count sentence not found"
    doc_total, doc_oracled, doc_rows_only = map(int, m.groups())
    total = len(QUERIES)
    oracled = sum(1 for q in QUERIES.values() if q.oracle)
    assert (doc_total, doc_oracled, doc_rows_only) == (
        total,
        oracled,
        total - oracled,
    ), (
        f"COVERAGE.md header says {doc_total}/{doc_oracled}/{doc_rows_only} "
        f"but the registry has {total}/{oracled}/{total - oracled}"
    )


def test_coverage_twin_audit_table_covers_every_rows_only_query():
    """The rows-only twin-audit table must name EVERY currently
    registered rows-only query (VERDICT r10 #3) — each needs its oracled
    twin or behavioral evidence documented."""
    import pathlib
    import re

    text = (
        pathlib.Path(__file__).resolve().parents[1] / "COVERAGE.md"
    ).read_text()
    section = text.split("rows-only oracle-twin audit", 1)[1]
    # table rows look like: | `name` | twin ... | why ... |
    documented = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    rows_only = {n for n, q in QUERIES.items() if q.oracle is None}
    missing = rows_only - documented
    assert not missing, f"rows-only queries absent from twin audit: {missing}"


def test_registry_doc_matches_generator():
    """VERDICT r11 #6: REGISTRY.md is the autogenerated one-row-per-query
    reference; pin it to the live registry by regenerating in-memory and
    diffing, so a registration without `python tools/gen_registry_doc.py`
    fails the suite instead of silently drifting the doc."""
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "tools"))
    try:
        import gen_registry_doc
    finally:
        sys.path.pop(0)
    expected = gen_registry_doc.render()
    actual = (repo / "REGISTRY.md").read_text()
    assert actual == expected, (
        "REGISTRY.md is stale — re-run `python tools/gen_registry_doc.py`"
    )
