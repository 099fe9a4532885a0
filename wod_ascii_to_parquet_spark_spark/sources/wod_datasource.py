"""WOD ASCII as a REGISTERED Spark 4 Python DataSource:

    spark.dataSource.register(WodAsciiDataSource)
    spark.read.format("wod_ascii").load("/path/to/WOD/files")

The same decoder as ``wod_ascii.wod_scan`` (``wod_format.iter_casts``),
exposed through the DataSource V2 Python API instead of the
binaryFile + mapInPandas plumbing: one InputPartition per file (gzip is
unsplittable, so the file IS the natural split), rows stream out of the
Python worker as the tagged-union ``schemas.PARSED`` tuples.

When to use which: ``wod_scan(scatter=True)`` remains the conversion
pipeline's path — its record-scatter exchange decouples decode width from
file count, which the one-partition-per-file DataSource cannot do. The
DataSource is the ergonomic surface (``spark.read.format``) for ad-hoc
exploration and for integration with catalogs/readers that speak formats,
and the parity test pins both paths to identical casts.

Reference: the reader side of ``CastFileReader`` + ``DatasetYearTrain
.java:141-209``, re-expressed as a planner-visible source.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import PARSED


class WodFilePartition(InputPartition):
    """One WOD data file = one split (gzip members are unsplittable)."""

    def __init__(self, path: str) -> None:
        self.path = path


def _discover(root: str) -> list[str]:
    if os.path.isfile(root):
        return [root]
    found: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".gz") or f.upper().startswith(
                ("APB", "CTD", "DRB", "GLD", "MBT", "MRB", "OSD", "PFL",
                 "SUR", "UOR", "XBT")
            ):
                found.append(os.path.join(dirpath, f))
    return sorted(found)


class WodAsciiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        root = options.get("path")
        if not root:
            raise ValueError("wod_ascii: .load(path) is required")
        self.root = root

    def partitions(self) -> Sequence[InputPartition]:
        paths = _discover(self.root)
        if not paths:
            raise FileNotFoundError(f"wod_ascii: no WOD files under {self.root}")
        return [WodFilePartition(p) for p in paths]

    def read(self, partition: WodFilePartition) -> Iterator[tuple]:
        # Runs in the Python worker: stream-decode one file's casts.
        from .wod_ascii import parse_file_content

        with open(partition.path, "rb") as fh:
            content = fh.read()
        yield from parse_file_content(partition.path, content)


class WodAsciiDataSource(DataSource):
    """``format("wod_ascii")`` — schema is the fixed tagged union."""

    @classmethod
    def name(cls) -> str:
        return "wod_ascii"

    def schema(self):
        return PARSED

    def reader(self, schema) -> WodAsciiReader:
        return WodAsciiReader(self.options)


def register_wod_datasource(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(WodAsciiDataSource)
