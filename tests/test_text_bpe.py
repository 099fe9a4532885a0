"""BPE tokenizer checks beyond cross-engine agreement: the trained
merges must equal an INDEPENDENT pure-Python Sennrich reference on a
hand-built corpus (both engines could in principle share a misreading of
the algorithm — this pins the algorithm itself), and the encoder's
counts must match a direct merge replay."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
    _N_MERGES,
    _greedy_disjoint,
    _train,
    _train_batched,
    text_bpe_encode,
    text_bpe_train,
)

from .conftest import SF_DIR


def _reference_bpe(docs: list[str], n_merges: int):
    """Plain-Python Sennrich BPE: word-frequency folding, pair argmax
    with (count DESC, 'a b' ASC) tie-break, greedy left-to-right
    non-overlapping merge within each word."""
    vocab = Counter()
    for t in docs:
        for w in t.split():
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for toks, freq in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += freq
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((rank, a, b, a + b, cnt))
        new_vocab: Counter = Counter()
        for toks, freq in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges, vocab


def _stage_docs(spark, tmp_path, docs: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs)),
            "text": docs,
            "lang": ["en"] * len(docs),
            "source": ["t"] * len(docs),
            "n_chars": [len(t) for t in docs],
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_trained_merges_match_python_reference(spark, tmp_path):
    docs = [
        "low lower lowest newest new newer",
        "widest wide wider low low lowest",
        "newer newest widest wide low",
    ]
    sf = _stage_docs(spark, tmp_path, docs)
    got = [
        (r.rank, r.pair_a, r.pair_b, r.merged, r.cnt)
        for r in text_bpe_train(spark, sf).orderBy("rank").collect()
    ]
    want, _ = _reference_bpe(docs, _N_MERGES)
    assert got == want


def test_encode_counts_match_reference_replay(spark, tmp_path):
    docs = ["low lower lowest", "new newer newest wide widest", "low new"]
    sf = _stage_docs(spark, tmp_path, docs)
    _, vocab = _reference_bpe(docs, _N_MERGES)
    tok_count = {"".join(t): len(t) for t in vocab}
    want = {
        i: sum(tok_count[w] for w in t.split()) for i, t in enumerate(docs)
    }
    got = {
        r.doc_id: r.n_bpe_tokens
        for r in text_bpe_encode(spark, sf).collect()
    }
    assert got == want


def test_back_to_back_pair_merges_both(spark, tmp_path):
    """ADVICE r14 regression: a pair repeating back-to-back within one
    word ('papa' = p,a,p,a) must merge BOTH occurrences in the round
    that picks (p,a) — the single-space replace representation consumed
    the shared boundary space and merged only the first ('pa p a').
    The corpus is built so (p,a) wins round 1 by a wide margin, and the
    train AND encode paths are both checked against the pure-Python
    Sennrich reference (whose while-loop merges both by construction)."""
    docs = [
        "papa papa papa pan pat pad",
        "papa pap apa pan mama dada",
        "mama dada lull still hill",
    ]
    sf = _stage_docs(spark, tmp_path, docs)
    got = [
        (r.rank, r.pair_a, r.pair_b, r.merged, r.cnt)
        for r in text_bpe_train(spark, sf).orderBy("rank").collect()
    ]
    want, vocab = _reference_bpe(docs, _N_MERGES)
    assert got == want
    assert want[0][1:3] == ("p", "a")  # the corpus pins (p,a) to round 1
    # 'papa' must tokenize as (pa, pa) after round 1's merge — i.e. 4
    # chars became 2 tokens somewhere in the learned vocab state
    papa = next(t for t in vocab if "".join(t) == "papa")
    assert len(papa) < 4, f"'papa' stayed unmerged past round 1: {papa}"
    tok_count = {"".join(t): len(t) for t in vocab}
    want_counts = {
        i: sum(tok_count[w] for w in t.split()) for i, t in enumerate(docs)
    }
    got_counts = {
        r.doc_id: r.n_bpe_tokens
        for r in text_bpe_encode(spark, sf).collect()
    }
    assert got_counts == want_counts


def test_greedy_disjoint_filter():
    """Greedy top-K non-interacting selection: accept in rank order iff
    the pair shares no token with a higher-ranked accepted pair."""
    cands = [
        {"a": "a", "b": "b", "cnt": 90},  # accept (slot 1)
        {"a": "b", "b": "c", "cnt": 80},  # reject: shares b with slot 1
        {"a": "c", "b": "a", "cnt": 70},  # reject: shares a with slot 1
        {"a": "c", "b": "d", "cnt": 60},  # accept (slot 2)
        {"a": "e", "b": "d", "cnt": 50},  # reject: shares d with slot 2
        {"a": "e", "b": "f", "cnt": 40},  # accept (slot 3)
        {"a": "g", "b": "h", "cnt": 30},  # beyond k
    ]
    got = _greedy_disjoint(cands, 3)
    assert got == [("a", "b", 90), ("c", "d", 60), ("e", "f", 40)]
    assert _greedy_disjoint(cands, 5) == [
        ("a", "b", 90), ("c", "d", 60), ("e", "f", 40), ("g", "h", 30)
    ]
    assert _greedy_disjoint([], 3) == []


def test_batched_equals_sequential_on_disjoint_corpus(spark, tmp_path):
    """On a corpus whose top pairs are pairwise token-disjoint and whose
    merges create no competitive new pairs (two-char words over disjoint
    alphabets, strictly decreasing frequencies), the batched trainer's
    flattened merge sequence must equal the sequential trainer's — the
    property that makes the batch a pure job-count optimization there."""
    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr"]
    docs = [
        " ".join(w for w, k in zip(words, range(len(words), 0, -1))
                 for _ in range(10 * k))
    ]
    sf = _stage_docs(spark, tmp_path, docs)
    seq, _ = _train(spark, sf, n_merges=9)
    bat, _ = _train_batched(spark, sf, rounds=3, k=3, pool=8)
    flat = [(i + 1, a, b, m, c)
            for i, (_, _, a, b, m, c) in enumerate(bat)]
    assert flat == seq
    # and the batch really did 3 merges per round
    assert [r for r, *_ in bat] == [1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_external_encode_keeps_unseen_words(spark, tmp_path):
    """The serving-shape pin (VERDICT r14 #3): a word absent from the
    training slice must still tokenize — char-level plus whatever
    frozen merges apply — not silently drop. doc_id 3 is the held-out
    slice (doc_id % 4 = 3); 'lowqz' never occurs in docs 0-2 but
    contains the trained merges' letters."""
    from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
        text_bpe_encode_external,
    )

    docs = [
        "low low low lower lower lowest newest newer new",
        "low lower lowest new newer newest wide wider widest",
        "wide wide wider widest low new lowest newest",
        "low lowqz zzz new",  # held out: lowqz and zzz are unseen
    ]
    sf = _stage_docs(spark, tmp_path, docs)
    got = {r.doc_id: r.n_bpe_tokens
           for r in text_bpe_encode_external(spark, sf).collect()}
    assert list(got) == [3]  # exactly the held-out doc
    # replay: train on docs 0-2 with the Python reference, apply the
    # merge rules to the held-out words by hand
    merges, _ = _reference_bpe(docs[:3], _N_MERGES)
    def apply(word):
        toks = list(word)
        for _, a, b, _, _ in merges:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(toks[i]); i += 1
            toks = out
        return toks
    want = sum(len(apply(w)) for w in docs[3].split())
    assert got[3] == want
    # the unseen words contributed: zzz must be 3 char tokens (no z
    # merges trainable from this corpus)
    assert len(apply("zzz")) == 3


def test_tokenizer_artifact_roundtrip_and_torn_build(spark, tmp_path):
    from wod_ascii_to_parquet_spark_spark.plans.bpe_tokenizer import (
        build_bpe_tokenizer,
        load_bpe_merges,
    )

    docs = ["low lower lowest new newer newest", "wide wider widest low"]
    sf = _stage_docs(spark, tmp_path, docs)
    build_bpe_tokenizer(spark, sf, table="bpe_tok_t1", n_merges=3)
    merges = load_bpe_merges(spark, "bpe_tok_t1")
    want, _ = _reference_bpe(docs, 3)
    assert merges == [(a, b) for _, a, b, _, _ in want]
    # torn build: meta claims a build no merge row carries
    import pytest as _pytest

    spark.createDataFrame(
        [("deadbeef", 99, "")],
        "build_id string, n_merges int, train_where string",
    ).write.format("parquet").mode("overwrite").saveAsTable(
        "bpe_tok_t1__meta"
    )
    with _pytest.raises(ValueError, match="torn"):
        load_bpe_merges(spark, "bpe_tok_t1")


def test_batched_tokenizer_build_encodes_like_sequential(spark, tmp_path):
    """`build_bpe_tokenizer(batched=True)` flattens (round, slot) to a
    global rank; on a disjoint-pairs corpus the stored artifact must
    encode identically to the sequential build of the same merge
    count (the property the flattening exists to preserve)."""
    from wod_ascii_to_parquet_spark_spark.plans.bpe_tokenizer import (
        build_bpe_tokenizer,
        encode_with_bpe_tokenizer,
        load_bpe_merges,
    )

    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr"]
    docs = [
        " ".join(w for w, k in zip(words, range(len(words), 0, -1))
                 for _ in range(10 * k))
    ]
    sf = _stage_docs(spark, tmp_path, docs)
    build_bpe_tokenizer(spark, sf, table="bpe_tok_seq9", n_merges=9)
    build_bpe_tokenizer(spark, sf, table="bpe_tok_bat9", batched=True)
    assert load_bpe_merges(spark, "bpe_tok_seq9") == load_bpe_merges(
        spark, "bpe_tok_bat9"
    )
    enc_docs = spark.createDataFrame(
        [(0, "ab cd zz abcd")], "doc_id bigint, text string"
    )
    seq = {r.doc_id: r.n_bpe_tokens for r in encode_with_bpe_tokenizer(
        spark, enc_docs, table="bpe_tok_seq9").collect()}
    bat = {r.doc_id: r.n_bpe_tokens for r in encode_with_bpe_tokenizer(
        spark, enc_docs, table="bpe_tok_bat9").collect()}
    # ab->1, cd->1, zz->2 (unseen, no merges apply), abcd->2 (ab+cd)
    assert seq == bat == {0: 6}


def test_external_encode_plan_is_exchange_free(spark):
    """The map-only claim, pinned: the frozen-tokenizer encode column
    (transform/aggregate higher-order functions, no explode, no join)
    must produce a plan with ZERO Exchanges after the artifact build —
    the property that lets the same column serve streaming append mode
    and keeps 100 TB encode embarrassingly parallel."""
    from wod_ascii_to_parquet_spark_spark.operators.text_bpe import (
        _EXT_HOLDOUT_WHERE,
        _EXT_TRAIN_WHERE,
    )
    from wod_ascii_to_parquet_spark_spark.plans.bpe_tokenizer import (
        build_bpe_tokenizer,
        encode_with_bpe_tokenizer,
    )
    from wod_ascii_to_parquet_spark_spark.registry import load

    build_bpe_tokenizer(
        spark, SF_DIR, table="bpe_tok_planpin", where=_EXT_TRAIN_WHERE
    )
    docs = (
        load(spark, SF_DIR, "documents")
        .filter(_EXT_HOLDOUT_WHERE)
        .select("doc_id", "text")
    )
    df = encode_with_bpe_tokenizer(spark, docs, table="bpe_tok_planpin")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_merges_compose_on_real_corpus(spark):
    """On the real sf0.001 corpus the learned merge table must be
    internally consistent: counts non-increasing with rank is NOT
    guaranteed by BPE (later merges can unlock bigger pairs), but every
    merged token must concatenate its pair, and ranks must be 1..N."""
    rows = text_bpe_train(spark, SF_DIR).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(1, _N_MERGES + 1))
    for r in rows:
        assert r.merged == r.pair_a + r.pair_b
        assert r.cnt > 0
