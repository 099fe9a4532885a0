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
                for c in re.findall(r"(?:WITH|,)\s*([a-zA-Z_][a-zA-Z0-9_]*)\s+AS\s*\(", q.oracle, re.I)
            }
            assert tok in allowed | ctes or tok in {"lateral"}, (
                f"{name}: oracle references unknown table {tok!r}"
            )


def test_query_names_are_stable_identifiers():
    for name in QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name
