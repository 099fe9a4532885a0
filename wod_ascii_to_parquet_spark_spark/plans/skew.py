"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join handles most skew automatically (enabled in session.py);
explicit salting remains necessary when (a) the skew is in an AGGREGATION
key rather than a join, or (b) the hot key's rows exceed what AQE's
partition-splitting can balance. The pattern: split the hot side's key into
``key × salt`` and replicate the other side once per salt value — the
shuffle then spreads the hot key over ``n_salts`` partitions.

Salt determinism is a CORRECTNESS requirement, not a style choice: the salt
feeds a shuffle, and Spark may recompute a map task after a fetch failure.
A nondeterministic salt (``rand()``, ``monotonically_increasing_id`` — the
latter depends on runtime row order within a partition) can assign a row a
different salt on recompute than the one some reducers already consumed,
double-counting or dropping it. The salt here is a pure function of row
CONTENT plus the source file name: stable across retries by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int, salt_on: Column | None) -> Column:
    """Deterministic per-row salt in ``[0, n_salts)``.

    Default: ``xxhash64(input_file_name(), *all columns)`` — varies within
    a hot key whenever its rows differ in ANY column or come from different
    files, and is identical on task recompute (it depends only on durable
    row identity, never on runtime row order). Limitation: full-duplicate
    rows within one file share a salt, so a hot key made of exact
    duplicates re-funnels; callers with such data pass ``salt_on`` (e.g. a
    pre-materialized row id from the source) to disambiguate.
    """
    if salt_on is not None:
        return F.pmod(F.xxhash64(salt_on), F.lit(n_salts))
    cols = [F.input_file_name()] + [F.col(c) for c in df.columns]
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_on: Column | None = None,
) -> DataFrame:
    """Equi-join with the big side salted per-row.

    The salt must vary WITHIN a hot key, so it cannot be a function of the
    key alone; it must also be deterministic under task recompute (see
    module docstring). Any salt value in ``[0, n_salts)`` joins correctly
    because the small side is replicated across all salts — salting
    changes only the shuffle distribution, never the result set. The small
    side is exploded ×``n_salts``; its duplication factor is the price of
    spreading the hot key.
    """
    big_salted = big.withColumn("__salt", _row_salt(big, n_salts, salt_on))
    small_salted = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def two_level_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Skew-safe sum aggregation: pre-aggregate on (key, salt), then merge
    the ≤``n_salts`` partials per key — the hot key's input spreads over
    ``n_salts`` reducers in phase one instead of hammering a single one.

    The grouped result is identical for ANY salt assignment; the
    deterministic content salt (see ``_row_salt``) additionally guarantees
    one CONSISTENT assignment across task retries, which is what makes the
    two-phase sum exactly-once under shuffle recomputation."""
    salted = df.withColumn("__salt", _row_salt(df, n_salts, salt_on))
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(value).alias("__partial_sum"), F.count(F.lit(1)).alias("__partial_n")
    )
    return partial.groupBy(key).agg(
        F.round(F.sum("__partial_sum"), 2).alias(f"sum_{value}"),
        F.sum("__partial_n").alias("n"),
    )
