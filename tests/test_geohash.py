"""Geohash correctness: canonical-bisection property + known vectors +
pandas-UDF / Column-expression parity."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from wod_ascii_to_parquet_spark_spark.functions.geohash import (
    geohash_col,
    geohash_encode_numpy,
    geohash_udf,
)

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def reference_bisection(lat: float, lon: float, precision: int = 12) -> str:
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    bits = []
    even = True
    while len(bits) < 5 * precision:
        rng, v = (lonr, lon) if even else (latr, lat)
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
    return "".join(
        BASE32[int("".join(map(str, bits[i : i + 5])), 2)]
        for i in range(0, 5 * precision, 5)
    )


KNOWN = [
    (57.64911, 10.40744, "u4pruydqqvj8"),  # geohash.org canonical example
    (0.0, 0.0, "s00000000000"),
    (-90.0, -180.0, "000000000000"),
]


@pytest.mark.parametrize("lat,lon,expected", KNOWN)
def test_known_vectors(lat, lon, expected):
    assert geohash_encode_numpy(np.array([lat]), np.array([lon]))[0] == expected


def test_matches_canonical_bisection():
    rng = np.random.default_rng(11)
    lats = rng.uniform(-90, 90, 1000)
    lons = rng.uniform(-180, 180, 1000)
    got = geohash_encode_numpy(lats, lons)
    for la, lo, g in zip(lats, lons, got):
        assert g == reference_bisection(la, lo)


def test_udf_and_column_expression_parity(spark):
    rng = np.random.default_rng(5)
    import pandas as pd

    pdf = pd.DataFrame(
        {"lat": rng.uniform(-90, 90, 300), "lon": rng.uniform(-180, 180, 300)}
    )
    df = spark.createDataFrame(pdf)
    rows = df.select(
        geohash_udf("lat", "lon").alias("g_udf"),
        geohash_col(F.col("lat"), F.col("lon")).alias("g_col"),
    ).collect()
    assert all(r.g_udf == r.g_col for r in rows)


def test_string_arm_matches_column_arm(spark):
    """geohash_col's generated-SQL build path (string inputs → one F.expr,
    the fast driver-side build the write path uses) must be bit-identical
    to the py4j Column composition — including nulls, poles, and the
    antimeridian."""
    rng = np.random.default_rng(13)
    coords = [
        (0.0, 0.0),
        (90.0, 180.0),
        (-90.0, -180.0),
        (89.9999999, 179.9999999),
        (None, 20.0),
        (20.0, None),
    ] + [
        (float(la), float(lo))
        for la, lo in zip(rng.uniform(-90, 90, 500), rng.uniform(-180, 180, 500))
    ]
    df = spark.createDataFrame(coords, "lat double, lon double")
    rows = df.select(
        geohash_col(F.col("lat"), F.col("lon")).alias("a"),
        geohash_col("lat", "lon").alias("b"),
    ).collect()
    assert all(r.a == r.b for r in rows)


def test_null_propagation(spark):
    df = spark.createDataFrame(
        [(1.0, None), (None, 2.0), (10.0, 20.0)], "lat double, lon double"
    )
    rows = df.select(geohash_udf("lat", "lon").alias("g")).collect()
    assert [r.g is None for r in rows] == [True, True, False]


def test_null_parity_udf_vs_catalyst_arms(spark):
    """UDF ↔ Catalyst null parity: Spark's least() SKIPS nulls, so an
    ungated Catalyst arm would clamp a null coordinate to the max cell
    index and emit a garbage NON-null geohash (convert.py partitions by
    geohash3 — such rows would land in a real-looking partition). Both
    Catalyst arms must instead produce NULL, exactly like geohash_udf."""
    df = spark.createDataFrame(
        [(1.0, None), (None, 2.0), (None, None), (10.0, 20.0)],
        "lat double, lon double",
    )
    rows = df.select(
        geohash_udf("lat", "lon").alias("g_udf"),
        geohash_col(F.col("lat"), F.col("lon")).alias("g_col"),
        geohash_col("lat", "lon").alias("g_sql"),
    ).collect()
    for r in rows:
        assert r.g_udf == r.g_col == r.g_sql
    assert [r.g_udf is None for r in rows] == [True, True, True, False]


def test_mixed_string_column_args(spark):
    """geohash_col with ONE string and ONE Column argument must behave
    exactly like the all-Column call — previously the string fell into
    Column arithmetic via __radd__ as lit("lat") → double-cast null →
    silently wrong non-null geohashes."""
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-33.9, 151.2)], "lat double, lon double"
    )
    rows = df.select(
        geohash_col(F.col("lat"), F.col("lon")).alias("ref"),
        geohash_col("lat", F.col("lon")).alias("m1"),
        geohash_col(F.col("lat"), "lon").alias("m2"),
    ).collect()
    assert rows[0].ref == "u4pruydqqvj8"
    for r in rows:
        assert r.ref == r.m1 == r.m2


def test_sql_mirror_matches_column_expression(spark):
    """The generated DuckDB mirror (geohash_sql_parts) must agree with the
    Catalyst expression char-for-char, including range edges and cell
    boundaries — this is what makes udf_geohash_oracle's hash gate
    trustworthy."""
    import duckdb

    from wod_ascii_to_parquet_spark_spark.functions.geohash import (
        geohash_sql_parts,
    )

    rng = np.random.default_rng(7)
    coords = [
        (0.0, 0.0),
        (90.0, 180.0),
        (-90.0, -180.0),
        (89.9999999, 179.9999999),
        (-89.9999999, -179.9999999),
        (45.0, -90.0),  # exact cell boundaries at several precisions
        (31.33, -140.58),
        (None, 20.0),  # null coords: both engines must yield NULL
        (20.0, None),
        (None, None),
    ] + [
        (float(la), float(lo))
        for la, lo in zip(
            rng.uniform(-90, 90, 60), rng.uniform(-180, 180, 60)
        )
    ]
    df = spark.createDataFrame(coords, "lat double, lon double")
    got = [
        r.gh
        for r in df.select(
            geohash_col(F.col("lat"), F.col("lon")).alias("gh")
        ).collect()
    ]
    lat_q, lon_q, concat = geohash_sql_parts("lat", "lon")
    con = duckdb.connect()
    want = [
        con.execute(
            f"WITH q AS (SELECT {lat_q} AS gh_lat, {lon_q} AS gh_lon"
            f" FROM (SELECT ? AS lat, ? AS lon)) SELECT {concat} FROM q",
            [la, lo],
        ).fetchone()[0]
        for la, lo in coords
    ]
    assert got == want
