"""Small-file compaction — the lakehouse ``OPTIMIZE`` primitive.

Long-lived datasets accumulate small files (streaming sinks, per-file
convert jobs, partitioned appends); at 100 TB the resulting metadata and
open-file overhead dominates scan cost long before the bytes do. Compaction
rewrites a dataset into ~``target_bytes`` files:

1. plan from REAL file sizes (Hadoop ``listFiles`` via ``FsClient`` — the
   same connector stack as the data I/O, so it works on ``file://``/
   ``s3a://``/``hdfs://`` alike);
2. one round-robin ``repartition(n)`` rewrite — an all-to-all shuffle of
   the data ONCE, buying every later scan fewer, right-sized files;
3. publish by rename: write to a sibling temp dir, swap, drop the old one.
   On posix/HDFS the swap is atomic; on s3a rename is copy+delete, so a
   production S3 deployment compacts into a NEW location and flips a table
   pointer (catalog/manifest) instead — the mechanics above stay the same.

``sortWithinPartitions`` on a clustering key can be layered on step 2 (see
``plans/zorder.py``) so compaction and re-clustering are one pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..sources.filesystem import FsClient

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int


def plan_target_files(total_bytes: int, target_bytes: int) -> int:
    """ceil(total/target), minimum one output file."""
    return max(1, math.ceil(total_bytes / max(1, target_bytes)))


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet dataset at ``path`` into ~``target_bytes`` files
    (optionally locally sorted by ``sort_by``). Skips the rewrite when the
    dataset is already at or below the target file count."""
    fs = FsClient(spark)
    sizes = {
        p: n
        for p, n in fs.file_sizes(path).items()
        if p.rsplit("/", 1)[-1].endswith(".parquet")
        or "part-" in p.rsplit("/", 1)[-1]
    }
    total = sum(sizes.values())
    n_out = plan_target_files(total, target_bytes)
    if len(sizes) <= n_out:
        return CompactionStats(len(sizes), len(sizes), total)

    tmp = path.rstrip("/") + "__compact_tmp"
    df = spark.read.parquet(path).repartition(n_out)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    df.write.mode("overwrite").parquet(tmp)

    fs.delete(path)
    if not fs.rename(tmp, path):
        raise RuntimeError(f"compaction publish failed: rename {tmp} -> {path}")
    after = sum(
        1
        for p in fs.file_sizes(path)
        if p.rsplit("/", 1)[-1].startswith("part-")
    )
    return CompactionStats(len(sizes), after, total)
