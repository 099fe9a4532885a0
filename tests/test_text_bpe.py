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
