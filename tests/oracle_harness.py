"""Local replica of the driver's DuckDB-oracle comparison.

For each registered query with an oracle: run the Spark DataFrame and the
DuckDB SQL over the same parquet tables, then compare

- row count,
- column-name set (schema),
- order-insensitive values (rows sorted; columns sorted by name; floats
  compared with a small tolerance to absorb engine summation-order ulps —
  the registered queries additionally round explicitly so the driver's
  exact hash agrees),
- a STRICT pandas-path stringified comparison that mirrors the driver's
  value hash: both results are pulled through pandas (``toPandas()`` /
  ``.df()``) so engine type-representation drift surfaces locally.
  Round-1 lesson: DuckDB ``sum(BIGINT)`` returns HUGEINT, which pandas
  coerces to float64 — numerically equal to Spark's BIGINT but a different
  *string*, so the driver's hash mismatched while the tolerant
  ``fetchall()`` compare (HUGEINT → Python int) passed. The strict pass
  fails that class locally.
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


def _strict_cell(v) -> str:
    """Canonical string for one cell, applied identically to both engines.

    Values that pandas coerced differently (int64 vs float64, Decimal vs
    float) stringify differently and are reported — that is the point.
    """
    import numpy as np
    import pandas as pd

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strict_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{_strict_cell(k)}:{_strict_cell(x)}" for k, x in sorted(v.items())
        ) + "}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _strict_rows(pdf) -> list[tuple]:
    """Sort columns by lower-cased name, stringify cells, sort rows."""
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    rows = [
        tuple(_strict_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


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

    # Strict driver-mirror pass: both engines through pandas, stringified.
    spark_strict = _strict_rows(spark_df.toPandas())
    duck_strict = _strict_rows(con.execute(sql).df())
    if spark_strict != duck_strict:
        shown = 0
        n_strict = abs(len(spark_strict) - len(duck_strict))
        for a, b in zip(spark_strict, duck_strict):
            if a != b:
                n_strict += 1
                if shown < 3:
                    problems.append(f"strict repr row: spark={a} duck={b}")
                    shown += 1
        problems.append(
            f"strict stringified mismatch: {n_strict} rows "
            "(the driver's value hash would fail)"
        )
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
