"""Pin the round-15 single-slice local-DataFrame optimization
(``registry.local_df``): tiny metadata frames — artifact-table writes,
returned merge tables, the domain-mix weights — must be ONE partition,
so jobs over them schedule one task instead of one near-empty task per
core (measured 0.43 s vs 0.21 s per 9-row ``saveAsTable`` at local[32],
``tools/exp_tiny_write_latency.py``). Content must be identical to the
default ``createDataFrame`` path."""

from __future__ import annotations

import glob
import os

from wod_ascii_to_parquet_spark_spark.registry import local_df

from .conftest import SF_DIR


def test_local_df_single_partition_same_rows(spark):
    rows = [(i, f"s{i}") for i in range(9)]
    schema = "k int, v string"
    a = spark.createDataFrame(rows, schema)
    b = local_df(spark, rows, schema)
    assert b.rdd.getNumPartitions() == 1
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bpe_train_result_is_single_partition(spark):
    from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
        text_bpe_train,
        text_bpe_train_batched,
    )

    assert text_bpe_train(spark, SF_DIR).rdd.getNumPartitions() == 1
    assert text_bpe_train_batched(spark, SF_DIR).rdd.getNumPartitions() == 1


def test_tokenizer_artifact_writes_one_file(spark):
    """The stored merge table must be ONE data file: the write job ran
    as one task, and a reader lists/opens a single parquet footer."""
    from wod_ascii_to_parquet_spark_spark.plans.bpe_tokenizer import (
        build_bpe_tokenizer,
        load_bpe_merges,
    )

    table = "bpe_tok_sliced"
    build_bpe_tokenizer(spark, SF_DIR, table=table)
    merges = load_bpe_merges(spark, table)
    assert merges  # round-trip works
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (table, f"{table}__meta"):
        files = [
            p
            for p in glob.glob(os.path.join(wh, t, "*"))
            if not os.path.basename(p).startswith("_")
        ]
        assert len(files) == 1, (t, files)
