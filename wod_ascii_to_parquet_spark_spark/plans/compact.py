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


def _is_data_file(path: str) -> bool:
    """One predicate for before/after file counts: committer data files only
    (``part-*``), never markers (``_SUCCESS``) or stray non-data names —
    counting different sets on each side yields nonsense deltas."""
    return path.rsplit("/", 1)[-1].startswith("part-")


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet dataset at ``path`` into ~``target_bytes`` files
    (optionally locally sorted by ``sort_by``). Skips the rewrite when the
    dataset is already at or below the target file count.

    Publish order is crash-safe: the live dir is renamed ASIDE first
    (``path__old``), the rewrite renamed into place, then the old dir
    dropped. A failure between the two renames leaves ``path__old`` intact
    and restorable (and this function restores it on a failed second
    rename) — the old delete-then-rename order had a window where the only
    copy of the data sat in a temp dir nobody reads. On s3a, where rename
    is copy+delete and the window is wide, production deployments compact
    into a NEW versioned location and flip a catalog pointer instead (see
    module docstring); the aside-rename here is still strictly safer than
    delete-first."""
    fs = FsClient(spark)
    sizes = {
        p: n for p, n in fs.file_sizes(path).items() if _is_data_file(p)
    }
    total = sum(sizes.values())
    n_out = plan_target_files(total, target_bytes)
    if len(sizes) <= n_out:
        return CompactionStats(len(sizes), len(sizes), total)

    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    df = spark.read.parquet(path).repartition(n_out)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    df.write.mode("overwrite").parquet(tmp)

    fs.delete(old)  # clear any leftover from a previous crashed publish
    if not fs.rename(path, old):
        raise RuntimeError(f"compaction publish failed: rename {path} -> {old}")
    if not fs.rename(tmp, path):
        restored = fs.rename(old, path)
        raise RuntimeError(
            f"compaction publish failed: rename {tmp} -> {path}"
            f" (previous data {'restored' if restored else f'LEFT AT {old}'})"
        )
    fs.delete(old)
    after = sum(1 for p in fs.file_sizes(path) if _is_data_file(p))
    return CompactionStats(len(sizes), after, total)
