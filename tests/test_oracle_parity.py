"""Per-operator DuckDB-oracle parity at sf0.001 — the local stand-in for the
driver's CORRECTNESS gate. Every registered query with an oracle must match
on row count, schema, and (order-insensitively) values; rows-only queries
must at least run and return a stable schema with deterministic row count.
"""

from __future__ import annotations

import pytest

from wod_ascii_to_parquet_spark_spark.registry import load_all_operators

from .conftest import SF_DIR
from .oracle_harness import compare, duck_connection

QUERIES = load_all_operators()
ORACLED = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    problems = compare(df, duck, q.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert df.columns, f"{name} returned no columns"
    # determinism: second run returns identical count
    assert q.fn(spark, SF_DIR).count() == rows
