"""Runtime bloom-filter join pruning — deliberate opt-in for big scans.

Catalyst's ``InjectRuntimeFilter`` rule can push a bloom filter BUILT FROM
THE SELECTIVE SIDE of a shuffle join into the probe side's scan: the
filtered dim side folds its join keys into a bloom filter (a two-phase
``bloom_filter_agg``), and every probe-side row is pre-tested with
``might_contain`` BEFORE it is shuffled. At 100 TB this is the difference
between shuffling the whole fact table and shuffling only the ~selectivity
fraction that can possibly match — the same row-pruning a broadcast join
gets for free, extended to joins too big to broadcast.

Spark gates the rule on the probe side being large
(``applicationSideScanSizeThreshold``, default 10 GB) — correct in
production, never true at test scale. :func:`runtime_bloom_filters` opens
the gate explicitly and restores the session afterwards, so the behavior
is an opt-in property of a specific job, not ambient session state that
would tax every small query with a filter build.

Usage::

    with runtime_bloom_filters(spark):
        big.join(selective_dim, "key").write...

Verified in tests/test_runtime_filters.py: the physical plan contains the
``might_contain`` probe + ``bloom_filter_agg`` build, and results are
identical with and without the filter (it is pure pruning, never
semantics).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

#: Confs the context manager sets (and restores). The scan-size gate drops
#: to 0 so the rule fires at any probe-side size; the creation-side cap
#: stays generous (the build is a shuffle-free partial/final aggregate).
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


@contextmanager
def runtime_bloom_filters(spark: SparkSession, extra: dict | None = None):
    """Enable runtime bloom-filter injection for the plans EXECUTED inside
    the block (injection happens at optimization time, so the conf must be
    live when an action runs, not when the DataFrame is built). Previous
    conf values are restored on exit — including unset ones."""
    confs = dict(_BLOOM_CONFS, **(extra or {}))
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
