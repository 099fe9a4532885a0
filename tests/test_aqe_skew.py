"""AQE skew-join handling: the runtime answer to hot keys.

`plans/skew.py` is the MANUAL salting path (deterministic, chooseable per
query). This test pins the AUTOMATIC one: with adaptive execution on, a
shuffle join whose one partition dwarfs the others is split at runtime
(OptimizeSkewedJoin marks the join `skew=true` and the shuffle read
`skewed`), with results identical to the unsplit join. At 100 TB the
thresholds stay at their defaults (256MB/factor 5); here they are lowered
so toy data crosses them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # ~99% of left rows share key 0; right is uniform on 100 keys.
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 == 0, F.col("id") % 7)
            .otherwise(0)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), F.col("id").alias("rv")
        )
        j = left.join(right, "k")
        # every left row matches exactly one right row
        assert j.count() == 200_000
        # execute THIS QueryExecution so its adaptive plan is finalized
        j.foreach(lambda r: None)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
