"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join handles most skew automatically (enabled in session.py);
explicit salting remains necessary when (a) the skew is in an AGGREGATION
key rather than a join, or (b) the hot key's rows exceed what AQE's
partition-splitting can balance. The pattern: split the hot side's key into
``key × salt`` and replicate the other side once per salt value — the
shuffle then spreads the hot key over ``n_salts`` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted per-row.

    The salt must vary WITHIN a hot key, so it cannot be a function of the
    key (or of column values at all — a hot key whose rows are full
    duplicates would still collapse to one salt). A per-row position salt
    (``monotonically_increasing_id``) spreads every hot key evenly; any
    salt value in ``[0, n_salts)`` joins correctly because the small side
    is replicated across all salts, so retry nondeterminism cannot change
    the result set. The small side is exploded ×``n_salts`` — its
    duplication factor is the price of spreading the hot key.
    """
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def two_level_agg(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Skew-safe sum aggregation: pre-aggregate on (key, salt), then merge
    the ≤``n_salts`` partials per key — the hot key's input spreads over
    ``n_salts`` reducers in phase one instead of hammering a single one.

    The salt is per-row (position hash), NOT a value hash: a hot key whose
    rows share one value — a common skew shape — would map to a single
    salt and re-funnel to one reducer. The grouped result is identical for
    any salt assignment; only the phase-one distribution changes."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__partial_sum"), F.count(F.lit(1)).alias("__partial_n")
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("__partial_sum"), 2).alias(f"sum_{value}"),
        F.sum("__partial_n").alias("n"),
    )
