"""Z-order (Morton) clustering for multi-dimensional data skipping.

The lakehouse ``OPTIMIZE ... ZORDER BY (a, b)`` primitive, Spark-first:
interleave the bits of two dimension keys into one Morton code, then
``repartitionByRange`` + ``sortWithinPartitions`` on it. Rows close in BOTH
dimensions land in the same parquet files/row groups, so min/max statistics
prune scans filtered on EITHER dimension — the property a single-column
sort cannot give. All bit-twiddling is Catalyst ``shiftright``/``&``/
``shiftleft`` on BIGINT (codegen'd, oracle-able); no UDFs.

Scale notes (100 TB): the range partitioner samples the z-key distribution,
so output files are even-sized regardless of key skew; bits-per-dimension
bounds the interleave depth (16 bits/dim → 4 G cells is plenty for file-
level skipping). Clustering cost is one shuffle + local sort — the same
shape as any global sort, but paid once at write time to make every later
scan cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two non-negative int columns (``bits`` low bits
    each) into one BIGINT: x's bit i → position 2i, y's bit i → 2i+1."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("bigint"), i).bitwiseAND(1), 2 * i + 1
            )
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical Morton interleave as ANSI/DuckDB SQL (oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    n_files: int,
    bits: int = ZBITS,
) -> None:
    """Cluster ``df`` by the (xcol, ycol) Morton code into ``n_files``
    range-partitioned, internally-sorted parquet files. Each output file
    covers one contiguous z-range → tight per-file min/max on BOTH
    dimensions (asserted in tests/test_zorder.py)."""
    keyed = df.withColumn("__z", zorder_key(F.col(xcol), F.col(ycol), bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
