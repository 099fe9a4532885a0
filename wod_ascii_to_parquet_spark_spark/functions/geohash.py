"""Geohash encoding — the one genuinely custom scalar function in the engine.

The reference obtains geohashes from the external transformer library (and
has Sedona's ``ST_GeoHash`` on the classpath, ``pom.xml:121-130``); here it
is implemented twice, both executor-side:

- ``geohash_udf`` — numpy-vectorized ``pandas_udf``: bit-interleaves the
  whole Arrow batch with array ops (no per-row Python), ~1e7 rows/s/core.
- ``geohash_col`` — pure Catalyst Column expression (unrolled bit loop):
  zero Python, whole-stage-codegen'd; used where the plan must stay fully
  JVM-side.

Both produce standard base-32 geohashes (precision 12 ≈ 3.7 cm cells);
``geohash3`` partition keys are ``substring(geohash, 1, 3)`` exactly as the
reference consumes them (``DatasetYearTrain.java:131,136``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
DEFAULT_PRECISION = 12


def geohash_encode_numpy(
    lat: np.ndarray, lon: np.ndarray, precision: int = DEFAULT_PRECISION
) -> np.ndarray:
    """Vectorized geohash: quantize lat/lon to ``5*precision/2``-bit integers,
    interleave bits (lon first), emit base-32 chars. All array ops."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lat_q = np.clip(
        ((lat + 90.0) / 180.0 * (1 << nlat)).astype(np.uint64), 0, (1 << nlat) - 1
    )
    lon_q = np.clip(
        ((lon + 180.0) / 360.0 * (1 << nlon)).astype(np.uint64), 0, (1 << nlon) - 1
    )
    inter = np.zeros(len(lat), dtype=np.uint64)
    for i in range(nlon):  # interleave: lon gets even bit positions (MSB first)
        inter |= ((lon_q >> np.uint64(nlon - 1 - i)) & np.uint64(1)) << np.uint64(
            nbits - 1 - 2 * i
        )
    for i in range(nlat):
        inter |= ((lat_q >> np.uint64(nlat - 1 - i)) & np.uint64(1)) << np.uint64(
            nbits - 2 - 2 * i
        )
    chars = np.empty((len(lat), precision), dtype="U1")
    lut = np.array(list(_BASE32))
    for c in range(precision):
        idx = (inter >> np.uint64(5 * (precision - 1 - c))) & np.uint64(31)
        chars[:, c] = lut[idx.astype(np.int64)]
    out = np.array(["".join(row) for row in chars], dtype=object)
    return out


@F.pandas_udf(T.StringType())
def geohash_udf(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """Arrow-batched geohash(lat, lon) at precision 12; nulls propagate."""
    mask = lat.notna() & lon.notna()
    out = pd.Series([None] * len(lat), dtype=object)
    if mask.any():
        out[mask] = geohash_encode_numpy(
            lat[mask].to_numpy(), lon[mask].to_numpy()
        )
    return out


def geohash_sql_parts(
    lat_expr: str, lon_expr: str, precision: int = DEFAULT_PRECISION
) -> tuple[str, str, str]:
    """DuckDB SQL mirror of :func:`geohash_col` — the same quantize /
    bit-interleave / base-32 arithmetic rendered as generated SQL, so the
    engine's geohash derivation (the write path's partition key) is
    verifiable against a second engine. Returns ``(lat_q_sql, lon_q_sql,
    concat_sql)``; the caller aliases the first two as ``gh_lat`` /
    ``gh_lon`` in a CTE and selects the third over it. Both engines
    perform the identical double arithmetic in the identical order, so
    the quantized bits are bit-exact; DuckDB's ``floor`` returns DOUBLE,
    hence the ``::BIGINT``."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    # Explicit null gate: DuckDB's least() (like Spark's) SKIPS nulls, so
    # without it a null coordinate would quantize to the max cell index and
    # emit a garbage non-null geohash. With the gate the null quant rides
    # the bit arithmetic (null >> p → null) into a null char, and DuckDB's
    # `||` propagates it to a null geohash — matching geohash_udf.
    lat_q = (
        f"CASE WHEN ({lat_expr}) IS NULL THEN NULL ELSE "
        f"least(floor(({lat_expr} + 90.0) / 180.0 * {float(1 << nlat)!r}),"
        f" {float((1 << nlat) - 1)!r})::BIGINT END"
    )
    lon_q = (
        f"CASE WHEN ({lon_expr}) IS NULL THEN NULL ELSE "
        f"least(floor(({lon_expr} + 180.0) / 360.0 * {float(1 << nlon)!r}),"
        f" {float((1 << nlon) - 1)!r})::BIGINT END"
    )
    chars = []
    for c in range(precision):
        terms = []
        for b in range(5):
            g = 5 * c + b  # global interleaved bit index, MSB first
            src, pos = (
                ("gh_lon", nlon - 1 - g // 2)
                if g % 2 == 0
                else ("gh_lat", nlat - 1 - g // 2)
            )
            terms.append(f"(({src} >> {pos}) & 1) * {1 << (4 - b)}")
        chars.append(
            f"substring('{_BASE32}', ({' + '.join(terms)})::INTEGER + 1, 1)"
        )
    return lat_q, lon_q, " || ".join(chars)


def geohash_spark_sql(
    lat_expr: str, lon_expr: str, precision: int = DEFAULT_PRECISION
) -> str:
    """Spark-SQL text form of :func:`geohash_col` — the identical quantize /
    interleave / base-32 arithmetic (same operations, same order, same
    double literals via the ``D`` suffix, so the values are bit-exact; value
    parity with the Column arm is asserted in tests/test_geohash.py).

    Exists for BUILD time, not run time: the unrolled Column form costs
    ~0.45 s of driver py4j round-trips per query build (12 chars × 5 bits ×
    several calls each), while parsing one generated SQL string JVM-side is
    ~10 ms — the ``simhash_bits`` / ``similarity._dot_sql`` rationale. The
    write path builds this expression on every per-file job, so at a
    many-file ``convert`` run the py4j build tax was per FILE."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    # ((x + off)/span * 2^n) with D-suffixed literals: Spark parses bare
    # decimal literals as DECIMAL, which would change the arithmetic — the
    # D suffix pins DOUBLE, matching F.lit(90.0) in the Column arm.
    # Null gate (Spark's least() skips nulls — without it a null coordinate
    # clamps to the max cell index and yields a garbage NON-null geohash;
    # convert.py partitions on geohash3, so such rows would land in a
    # real-looking partition). A null quant propagates through shiftright/
    # &/+ to a null char, and concat() returns null on any null input —
    # matching geohash_udf's null-propagation contract.
    lat_q = (
        f"if(({lat_expr}) IS NULL, CAST(NULL AS BIGINT), "
        f"least(floor((({lat_expr}) + 90.0D) / 180.0D * "
        f"{float(1 << nlat)!r}D), {(1 << nlat) - 1}L))"
    )
    lon_q = (
        f"if(({lon_expr}) IS NULL, CAST(NULL AS BIGINT), "
        f"least(floor((({lon_expr}) + 180.0D) / 360.0D * "
        f"{float(1 << nlon)!r}D), {(1 << nlon) - 1}L))"
    )
    chars = []
    for c in range(precision):
        terms = []
        for b in range(5):
            g = 5 * c + b  # global interleaved bit index, MSB first
            src, pos = (
                (lon_q, nlon - 1 - g // 2)
                if g % 2 == 0
                else (lat_q, nlat - 1 - g // 2)
            )
            terms.append(f"(shiftright({src}, {pos}) & 1) * {1 << (4 - b)}")
        chars.append(
            f"substring('{_BASE32}', "
            f"cast({' + '.join(terms)} as int) + 1, 1)"
        )
    return "concat(" + ", ".join(chars) + ")"


def geohash_col(
    lat: Column | str, lon: Column | str, precision: int = DEFAULT_PRECISION
) -> Column:
    """Geohash as a pure Catalyst expression (unrolled over base-32 chars).

    Quantizes to bigint, then per output char extracts 5 interleaved bits
    with shift/and arithmetic and indexes the base-32 alphabet — stays
    inside whole-stage codegen, no Python worker round-trip.

    Pass STRING column names / SQL fragments to get the expression via one
    JVM-side parse of generated SQL (:func:`geohash_spark_sql`) — the fast
    build path; Column inputs keep the py4j composition for callers holding
    computed Columns. Both produce bit-identical values, and both propagate
    a null lat OR lon to a null geohash (matching :func:`geohash_udf`)."""
    if isinstance(lat, str) and isinstance(lon, str):
        return F.expr(geohash_spark_sql(lat, lon, precision))
    # Mixed str/Column: normalize strings to Columns. Without this, a call
    # like geohash_col("lat", F.col("lon")) would hit `lat + F.lit(90.0)`
    # below via Column.__radd__, which wraps the STRING as lit("lat") —
    # cast to double → null → silently wrong geohashes for every row.
    if isinstance(lat, str):
        lat = F.col(lat)
    if isinstance(lon, str):
        lon = F.col(lon)
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    # F.when with no otherwise → null: the null gate mirroring the SQL arm
    # (F.least skips nulls, so an ungated null coord clamps to max index).
    lat_q = F.when(
        lat.isNotNull(),
        F.least(
            F.floor(
                (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << nlat))
            ),
            F.lit((1 << nlat) - 1),
        ),
    ).cast("bigint")
    lon_q = F.when(
        lon.isNotNull(),
        F.least(
            F.floor(
                (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << nlon))
            ),
            F.lit((1 << nlon) - 1),
        ),
    ).cast("bigint")

    def bit(col: Column, pos: int) -> Column:  # pos from MSB=0
        return F.shiftright(col, pos).bitwiseAND(F.lit(1))

    chars = []
    for c in range(precision):
        idx = F.lit(0)
        for b in range(5):
            g = 5 * c + b  # global interleaved bit index, MSB first
            src_bit = (
                bit(lon_q, nlon - 1 - g // 2)
                if g % 2 == 0
                else bit(lat_q, nlat - 1 - g // 2)
            )
            idx = idx * 2 + src_bit
        chars.append(F.substring(F.lit(_BASE32), 1, 32).substr(idx + 1, F.lit(1)))
    return F.concat(*chars)
