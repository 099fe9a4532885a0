"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL over the same parquet tables, then compare

- row count,
- column-name set (schema),
- order-insensitive values (rows sorted; columns sorted by name; floats
  compared with a small tolerance to absorb engine summation-order ulps —
  the registered queries additionally round explicitly so the driver's
  exact hash agrees).
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from wod_ascii_to_parquet_spark_spark.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _sortkey(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    duck_res = con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"schema: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} duck={len(duck_rows)}")

    # Reorder duck columns to spark order, then sort columns by name.
    order = [duck_cols.index(next(d for d in duck_cols if d.lower() == c.lower()))
             for c in spark_cols]
    duck_rows = [tuple(row[i] for i in order) for row in duck_rows]
    perm = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    s_rows = sorted(
        [tuple(_canon(r[i]) for i in perm) for r in spark_rows], key=_sortkey
    )
    d_rows = sorted(
        [tuple(_canon(r[i]) for i in perm) for r in duck_rows], key=_sortkey
    )
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not _rows_close(sr, dr):
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={sr} duck={dr}")
    if n_bad:
        problems.append(f"value mismatches: {n_bad}/{len(s_rows)}")
    return problems


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
