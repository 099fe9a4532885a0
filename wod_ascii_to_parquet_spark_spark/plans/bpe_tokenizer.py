"""Persisted BPE tokenizer artifact — the SERVING split for the trained
tokenizer (VERDICT r14 #3).

``operators/text_bpe.py`` trains the merge table; production encodes NEW
documents against a FROZEN tokenizer, so the merge table must be a stored
artifact with the same build→store→load→serve lifecycle the ANN and
MinHash indexes have (``plans/ann_index.py`` / ``plans/minhash_index.py``
pattern: build verb writes managed tables, the serving verb loads the
stored artifact — never retrains in-query):

- :func:`build_bpe_tokenizer` — train (sequential or batched) on a corpus
  slice and persist ``(rank, pair_a, pair_b, merged, cnt, build_id)``
  plus a meta row;
- :func:`load_bpe_merges` — read the frozen merge list back (bounded:
  vocab-size rows of metadata, the codebook-collect pattern);
- :func:`encode_with_bpe_tokenizer` — tokenize ANY documents frame by
  applying the frozen merge rules to every word: explode → per-word
  double-space char representation → one chained Catalyst ``replace``
  per merge → token count per document. A word never seen in training
  still tokenizes (char-level plus whatever learned merges apply) —
  unlike the training-state join in ``text_bpe_encode``, which can only
  count words the trainer saw.

Scale notes (100 TB): encode is MAP-ONLY until the final per-document
sum — no join against a vocab, no shuffle besides the one ``groupBy``
the result needs anyway. The merge chain is Catalyst string ops (JVM,
whole-stage codegen); at production merge counts (30k+) switch the
per-word chain to the unique-word fold (dedup words, apply the chain
once per DISTINCT word, broadcast the word→count map back), which is
the same Heaps'-law sublinearity the trainer exploits.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import local_df
from .minhash_index import _clear_table

TOKENIZER_TABLE = "bpe_tokenizer"


def build_bpe_tokenizer(
    spark: SparkSession,
    sf_dir: str,
    table: str = TOKENIZER_TABLE,
    n_merges: int | None = None,
    where: str | None = None,
    batched: bool = False,
) -> str:
    """Train BPE on ``documents`` (optionally restricted by ``where``)
    and persist the merge table. ``batched=True`` trains with the
    top-K-disjoint batched rounds (``_train_batched``); merges are
    flattened to a global rank in (round, slot) order — the order the
    encoder must replay them in. Returns the ``build_id``."""
    from ..operators.text_bpe import _N_MERGES, _train, _train_batched

    build_id = uuid.uuid4().hex
    if batched:
        raw, _ = _train_batched(spark, sf_dir, where=where)
        merges = [
            (i + 1, a, b, m, cnt)
            for i, (_, _, a, b, m, cnt) in enumerate(raw)
        ]
    else:
        merges, _ = _train(
            spark, sf_dir, n_merges=n_merges or _N_MERGES, where=where
        )
    for t in (f"{table}__meta", table):
        _clear_table(spark, t)
    # meta first (minhash_index rule): a crash mid-build leaves a meta
    # row whose build_id no merge row carries — caught at load time.
    # Both artifact writes are single-slice (registry.local_df): the
    # default createDataFrame slicing made each ≤9-row saveAsTable a
    # defaultParallelism-task write job — measured 0.43 s vs 0.21 s per
    # write at local[32] (tools/exp_tiny_write_latency.py), ~0.45 s off
    # text_bpe_encode_external's two stores.
    local_df(
        spark,
        [(build_id, len(merges), where or "")],
        "build_id string, n_merges int, train_where string",
    ).write.format("parquet").mode("overwrite").saveAsTable(f"{table}__meta")
    local_df(
        spark,
        [(r, a, b, m, c, build_id) for (r, a, b, m, c) in merges],
        "rank int, pair_a string, pair_b string, merged string, "
        "cnt bigint, build_id string",
    ).write.format("parquet").mode("overwrite").saveAsTable(table)
    return build_id


def load_bpe_merges(
    spark: SparkSession, table: str = TOKENIZER_TABLE
) -> list[tuple[str, str]]:
    """The frozen merge list in rank order — bounded vocab-size
    metadata, not data. Verifies the build is not torn (meta build_id
    present in every merge row)."""
    meta = spark.table(f"{table}__meta").collect()
    if len(meta) != 1:
        raise ValueError(
            f"tokenizer table {table!r}: expected exactly one meta row, "
            f"found {len(meta)}"
        )
    build_id, n = meta[0]["build_id"], int(meta[0]["n_merges"])
    rows = spark.table(table).orderBy("rank").collect()
    if len(rows) != n or any(r["build_id"] != build_id for r in rows):
        raise ValueError(
            f"tokenizer table {table!r} is torn: meta says {n} merges of "
            f"build {build_id[:8]}, table holds {len(rows)} rows"
        )
    return [(r["pair_a"], r["pair_b"]) for r in rows]


def doc_bpe_token_count(merges: list[tuple[str, str]]):
    """Column: a document's total BPE token count under the frozen
    ``merges``, computed ENTIRELY inside higher-order functions — per
    word (``transform`` over the split text), the double-space char
    representation, every merge applied in rank order as a literal
    ``replace`` (rule application, not a vocab lookup — unseen words
    tokenize char-level plus applicable merges), then one ``aggregate``
    sum. Zero explodes, zero shuffles: the whole encode is a stateless
    row-local map, which is what lets the SAME column serve the batch
    arm AND a Structured Streaming frame in append mode."""

    def per_word(w):
        s = F.concat(
            F.lit(" "), F.array_join(F.split(w, ""), "  "), F.lit(" ")
        )
        for a, b in merges:
            s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
        return F.size(F.split(F.trim(s), "  ")).cast("bigint")

    words = F.filter(
        F.split(F.col("text"), "\\s+"), lambda w: F.length(w) > 0
    )
    return F.aggregate(
        F.transform(words, per_word),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def encode_with_bpe_tokenizer(
    spark: SparkSession,
    docs: DataFrame,
    table: str = TOKENIZER_TABLE,
) -> DataFrame:
    """Tokenize ``docs`` (``doc_id``, ``text``) against the FROZEN
    tokenizer in ``table`` via :func:`doc_bpe_token_count` — a pure
    row-local map (no explode, no join, no shuffle). Documents with no
    words are dropped (matching the oracle's ``length(w) > 0`` word
    filter + group-by semantics). Returns ``(doc_id, n_bpe_tokens)``."""
    merges = load_bpe_merges(spark, table)
    words = F.filter(
        F.split(F.col("text"), "\\s+"), lambda w: F.length(w) > 0
    )
    return docs.filter(F.size(words) > 0).select(
        "doc_id", doc_bpe_token_count(merges).alias("n_bpe_tokens")
    )
