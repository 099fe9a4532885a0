"""Training-data curation operators (LLM-pipeline extension, first-class).

The moves a pretraining-data pipeline makes after dedup/quality:

- ``curation_pack_sequences``   — pack documents into fixed token-budget
  bins (context-window packing) via a sharded running sum;
- ``curation_stratified_sample`` — deterministic per-stratum subsample with
  a multiplicative-hash pseudo-random order (reproducible across engines
  AND runs — no engine RNG);
- ``curation_domain_mix``       — resample to a target domain mixture
  (integer-permille weights, exact quotas, no upsampling);
- ``curation_repetition_score`` — repeated-3-gram fraction per document,
  the cheap repetition/boilerplate detector used for quality filtering;
- ``curation_decontaminate``    — 13-gram eval-benchmark overlap filter.

All are fully DuckDB-oracled: every pseudo-random choice is integer
arithmetic (no ``rand()``), every score is a ratio of counts.

Scale notes (100 TB):
- Packing uses a running sum windowed PER SHARD (``pmod(doc_id, 16)``), not
  a global ORDER BY — a global cumulative sum would serialize the corpus
  through one window partition. Shards pack independently (the standard
  distributed approximation: bin breakage at shard boundaries is bounded
  by n_shards × budget tokens).
- The stratified sample is a filter after one per-stratum window top-K; at
  extreme stratum skew, replace row_number with the hash-threshold form
  (``h % M < K*M/N``) which needs no window at all.
- The repetition score is per-row array math — map-only, embarrassingly
  parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, local_df, register, spread

#: Knuth multiplicative hash constant (2654435761 = 2^32 / φ); doc_id values
#: stay far below 2^20, so the product fits int64 exactly in both engines.
_KNUTH = 2654435761
_MOD = 1 << 32

PACK_BUDGET = 2048
PACK_SHARDS = 16


@register(
    "curation_pack_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               doc_id % {PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior
        FROM t
    )
    SELECT doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(prior / {PACK_BUDGET}) AS BIGINT) AS bin,
           CAST(prior % {PACK_BUDGET} AS BIGINT) AS offset_in_bin
    FROM c
    """,
    tags=("curation",),
)
def curation_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign each document a (shard, bin, offset)
    under a {PACK_BUDGET}-token budget, by running-sum position in doc_id
    order within its shard. A document straddling a boundary stays in the
    earlier bin (bins overflow by < one document — the greedy streaming
    packer's behavior). One window per shard; no global sort."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    t = d.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "n_tokens",
        F.floor(prior / PACK_BUDGET).cast("bigint").alias("bin"),
        (prior % PACK_BUDGET).cast("bigint").alias("offset_in_bin"),
    )


@register(
    "curation_stratified_sample",
    f"""
    SELECT lang, source, doc_id, n_chars FROM (
        SELECT lang, source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY (doc_id * {_KNUTH}) % {_MOD}, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
    tags=("curation",),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 5 documents per (lang, source)
    stratum, chosen by a Knuth multiplicative-hash ordering — reproducible
    pseudo-randomness with zero engine RNG, so the exact same sample falls
    out of Spark, DuckDB, or a re-run (seed changes = different constant).
    One window per stratum; for heavily skewed strata use the windowless
    hash-threshold form noted in the module docstring."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    w = W.partitionBy("lang", "source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "source", "doc_id", "n_chars")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )


@register(
    "curation_repetition_score",
    """
    SELECT doc_id,
           CAST(total AS BIGINT) AS n_grams,
           round(1.0 - n_distinct / total, 6) AS repetition
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) - 2 AS total,
               len(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS n_distinct
        FROM documents
    )
    WHERE total >= 1
    """,
    tags=("curation",),
)
def curation_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-3-gram fraction (1 − distinct/total) — the standard cheap
    boilerplate/repetition signal for pretraining quality filters. Pure
    per-row array expressions (map-only); documents with fewer than 3
    tokens are excluded (no 3-grams to measure)."""
    d = spread(load(spark, sf_dir, "documents"))
    # toks bound as its own projection: an HOF lambda re-evaluates every
    # captured non-attribute subtree per element, so capturing the raw
    # split() re-splits the text once per gram (dedup.shingles_toks has
    # the measured numbers); the lambda body itself is one
    # slice+array_join per gram — fewest interpreted nodes
    # (tools/exp_decon_gram_shape.py, tools/exp_shingles_bind_toks.py).
    b = d.select("doc_id", F.split("text", " ").alias("__toks"))
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, 3), " ")
    )
    total = (F.size(toks) - 2).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams))
    return (
        b.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            total.alias("n_grams"),
            F.round(
                F.lit(1.0) - n_distinct.cast("double") / total.cast("double"), 6
            ).alias("repetition"),
        )
    )


#: Target training mixture in integer permille (summing to 1000): integer
#: weights keep every quota computation exact in both engines — no binary-
#: fraction drift from literals like 0.15.
_MIX_PERMILLE = (("en", 400), ("de", 150), ("es", 150), ("fr", 150), ("zh", 150))


def _domain_mix_sql() -> str:
    values = ", ".join(f"('{k}', {v})" for k, v in _MIX_PERMILLE)
    # LEFT join from the WEIGHTS side: a configured domain absent from the
    # corpus contributes count 0 → total 0 → empty result (the mixture is
    # unsatisfiable without upsampling). An inner join would silently drop
    # the domain from the min() and ship a WRONG mixture of the rest.
    return f"""
    WITH w AS (SELECT * FROM (VALUES {values}) AS t(domain, wm)),
    cnt AS (SELECT lang AS domain, count(*) AS c FROM documents GROUP BY lang),
    cw AS (SELECT w.domain, coalesce(cnt.c, 0) AS c, w.wm
           FROM w LEFT JOIN cnt USING (domain)),
    t AS (SELECT min(CAST(floor(c * 1000.0 / wm) AS BIGINT)) AS total FROM cw),
    q AS (
        SELECT domain, CAST(floor(wm * total / 1000.0) AS BIGINT) AS quota
        FROM cw, t
    ),
    r AS (
        SELECT lang AS domain, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY (doc_id * {_KNUTH}) % {_MOD}, doc_id
               ) AS rn
        FROM documents
    )
    SELECT domain, doc_id FROM r JOIN q USING (domain) WHERE rn <= quota
    """


@register("curation_domain_mix", _domain_mix_sql(), tags=("curation",))
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the corpus to a TARGET domain mixture (the DoReMi/Pile-style
    "domain weights" step every pretraining pipeline runs): given integer-
    permille weights per domain (here ``lang``: en 40%, de/es/fr/zh 15%),
    keep the largest corpus that matches the mixture exactly WITHOUT
    upsampling — total = min over domains of floor(count/weight), quota_d =
    floor(weight_d × total) — selecting each domain's quota deterministically
    by Knuth-hash order (zero engine RNG, same sample from Spark, DuckDB, or
    any re-run). A configured domain with ZERO corpus documents makes the
    mixture unsatisfiable — the result is explicitly empty (total = 0),
    never a silently re-normalized mixture of the remaining domains.

    Scale shape: the per-domain counts and quotas are a tiny aggregate
    (|domains| rows) broadcast back; the only corpus-sized work is one
    window per domain for the quota cut. Domains are few by construction,
    so that window IS skewed — at 100 TB replace the exact-quota window
    with the windowless hash-threshold filter (keep iff
    ``hash(doc_id) % M < quota/count × M``, map-only, quota hit within
    ±O(√n) per domain) or pre-salt the window key; the exact-quota form
    here is the verification oracle for that optimization."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("domain")
    )
    cw = _mix_counts(spark, d)
    total = cw.agg(
        F.min(F.floor(F.col("c") * 1000.0 / F.col("wm"))).alias("total")
    )
    quotas = cw.crossJoin(F.broadcast(total)).select(
        "domain",
        F.floor(F.col("wm") * F.col("total") / 1000.0).alias("quota"),
    )
    from pyspark.sql import Window as W

    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    w = W.partitionBy("domain").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quotas), "domain")
        .filter(F.col("rn") <= F.col("quota"))
        .select("domain", "doc_id")
    )


def _mix_counts(spark: SparkSession, d: DataFrame) -> DataFrame:
    """(domain, c, wm) driven from the WEIGHTS side (left join + coalesce
    0), so a configured domain absent from the corpus keeps its row with
    count 0 — making the mixture explicitly unsatisfiable (total = 0)
    instead of silently re-normalizing over the surviving domains."""
    # single-slice (registry.local_df): the weights frame seeds the
    # quota broadcast-build job, whose every stage otherwise schedules
    # defaultParallelism near-empty tasks — measured −36% on
    # curation_domain_mix at local[32] (OPTIMIZATION_r15.md).
    weights = local_df(spark, list(_MIX_PERMILLE), "domain string, wm int")
    counts = d.groupBy("domain").agg(F.count("*").alias("c"))
    return weights.join(counts, "domain", "left").select(
        "domain", F.coalesce(F.col("c"), F.lit(0)).alias("c"), "wm"
    )


def _domain_mix_threshold_sql() -> str:
    values = ", ".join(f"('{k}', {v})" for k, v in _MIX_PERMILLE)
    # threshold in DOUBLE: quota/c ∈ [0,1], then × 2³² — an integer
    # quota*2³² wraps BIGINT once quota > 2³¹ (≈2.1e9 docs — real at the
    # scale this arm exists for); both engines run the identical IEEE
    # double expression, so the result stays bit-equal cross-engine.
    # CASE guards the empty-domain row (c = 0 → threshold 0, keep none).
    return f"""
    WITH w AS (SELECT * FROM (VALUES {values}) AS t(domain, wm)),
    cnt AS (SELECT lang AS domain, count(*) AS c FROM documents GROUP BY lang),
    cw AS (SELECT w.domain, coalesce(cnt.c, 0) AS c, w.wm
           FROM w LEFT JOIN cnt USING (domain)),
    t AS (SELECT min(CAST(floor(c * 1000.0 / wm) AS BIGINT)) AS total FROM cw),
    q AS (
        SELECT domain, c,
               CAST(floor(wm * total / 1000.0) AS BIGINT) AS quota
        FROM cw, t
    ),
    thr AS (
        SELECT domain,
               CASE WHEN c = 0 THEN 0
                    ELSE CAST(floor(quota / CAST(c AS DOUBLE)
                                    * {float(_MOD)}) AS BIGINT)
               END AS threshold
        FROM q
    )
    SELECT d.lang AS domain, d.doc_id
    FROM documents d JOIN thr ON thr.domain = d.lang
    WHERE (d.doc_id * {_KNUTH}) % {_MOD} < thr.threshold
    """


@register(
    "curation_domain_mix_threshold",
    _domain_mix_threshold_sql(),
    tags=("curation",),
)
def curation_domain_mix_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``curation_domain_mix``: WINDOWLESS mixture
    resampling. Instead of ranking every document inside its domain (a
    per-domain window — inherently skewed when domains are few and huge),
    keep a document iff its Knuth hash falls below the domain's threshold
    ``quota × 2³² ÷ count`` — a map-only filter against a broadcast
    |domains|-row threshold table. The realized quota lands within
    ±O(√n) of the target (hash uniformity), which is what a real pipeline
    accepts in exchange for deleting the corpus-wide shuffle; the
    exact-quota window arm is this operator's verification oracle (their
    agreement is tested, and both are independently DuckDB-oracled —
    every threshold is integer arithmetic, zero engine RNG).

    Plan shape (asserted in tests/test_plans.py): one tiny counts
    aggregate → broadcast join → filter; NO Window, no corpus shuffle."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("domain")
    )
    cw = _mix_counts(spark, d)
    total = cw.agg(
        F.min(F.floor(F.col("c") * 1000.0 / F.col("wm"))).alias("total")
    )
    # threshold via double division (quota/c ≤ 1, then × 2³²): an integer
    # quota*2³² wraps BIGINT past quota = 2³¹ — real at 100 TB. Identical
    # IEEE expression in the oracle keeps it bit-equal cross-engine.
    thresholds = cw.crossJoin(F.broadcast(total)).select(
        "domain",
        F.when(F.col("c") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.floor(F.col("wm") * F.col("total") / 1000.0)
                / F.col("c").cast("double")
                * F.lit(float(_MOD))
            )
        )
        .alias("threshold"),
    )
    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    return (
        d.join(F.broadcast(thresholds), "domain")
        .filter(h < F.col("threshold"))
        .select("domain", "doc_id")
    )


#: Benchmark-decontamination n-gram length — 13 is the published standard
#: (GPT-3 appendix C / Llama 2: flag train docs sharing any 13-gram with an
#: eval benchmark). The synthetic stand-in for the benchmark suite is the
#: first EVAL_DOCS documents.
DECON_N = 13
EVAL_DOCS = 20


@register(
    "curation_decontaminate",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, md5(array_to_string(t[i:i+{DECON_N - 1}], ' ')) AS g
        FROM toks, unnest(range(1, len(t) - {DECON_N - 2})) AS r(i)
        WHERE len(t) >= {DECON_N}
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id < {EVAL_DOCS})
    SELECT doc_id, count(DISTINCT g) AS n_contaminated
    FROM grams JOIN ev USING (g)
    WHERE doc_id >= {EVAL_DOCS}
    GROUP BY doc_id
    """,
    tags=("curation",),
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    13-gram with the eval set (docs 0..EVAL_DOCS-1 stand in for the
    benchmark suite), with the count of distinct contaminated grams —
    the GPT-3/Llama-style filter every pretraining pipeline runs before
    training.

    Scale shape: the corpus side is explode → md5 → broadcast-semi-join,
    never shuffled on its own volume — eval-benchmark gram sets are tiny
    (MBs) by construction, so candidate matching is map-side; only the
    matched grams (≈0 on clean corpora) reach the per-doc aggregate.
    Cross-engine: grams are joined on md5 of the joined token window, so
    both engines agree bit-exactly."""
    d = spread(load(spark, sf_dir, "documents"))
    # toks bound as a projected column so the 13-gram lambda captures an
    # attribute, not the split() subtree (re-split per gram otherwise —
    # see dedup.shingles_toks, r16).
    b = d.select("doc_id", F.split("text", " ").alias("__toks"))
    toks = F.col("__toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (DECON_N - 1)),
        lambda i: F.md5(F.array_join(F.slice(toks, i, DECON_N), " ")),
    )
    g = b.filter(F.size(toks) >= DECON_N).select(
        "doc_id", F.explode(grams).alias("g")
    )
    ev = g.filter(F.col("doc_id") < EVAL_DOCS).select("g").distinct()
    return (
        g.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_contaminated"))
    )


_QSCORE_SQL = (
    "round(len(list_filter(string_split(text, ' '), "
    "t -> list_contains(['the','a','of','and','to'], t)))::DOUBLE "
    "/ len(string_split(text, ' ')), 6)"
)


@register(
    "curation_quality_gate",
    f"""
    SELECT lang, doc_id, score FROM (
        SELECT lang, doc_id, {_QSCORE_SQL} AS score,
               percent_rank() OVER (
                   PARTITION BY lang ORDER BY {_QSCORE_SQL}, doc_id
               ) AS pr
        FROM documents
    ) WHERE pr >= 0.2
    """,
    tags=("curation", "text"),
)
def curation_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile quality gate: drop the bottom 20% of documents per
    language by quality score (stopword ratio — the cheap fluency proxy
    from ``text_quality``). Absolute thresholds are wrong across
    languages and crawls; real pipelines gate on the per-stratum score
    DISTRIBUTION, which is exactly a percent_rank window per language.
    Deterministic: the rank orders by (rounded score, doc_id), so ties
    cut identically in both engines. At 100 TB the exact window becomes
    a two-pass approx-quantile cutoff (percentile_approx per stratum,
    broadcast the thresholds, map-only filter) — the same
    exact-as-oracle / approx-at-scale pairing as the domain-mix arms."""
    from pyspark.sql import Window as W

    from .text import STOPWORDS, _nhits

    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    score = F.round(
        _nhits(toks, STOPWORDS["en"]).cast("double")
        / F.size(toks).cast("double"),
        6,
    )
    w = W.partitionBy("lang").orderBy(F.col("score").asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", score.alias("score"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.2)
        .select("lang", "doc_id", "score")
    )


N_SHUFFLE_SHARDS = 8


@register(
    "curation_global_shuffle",
    f"""
    SELECT doc_id, shard,
           row_number() OVER (
               PARTITION BY shard ORDER BY h, doc_id
           ) - 1 AS pos
    FROM (
        SELECT doc_id,
               (doc_id * {_KNUTH}) % {_MOD} AS h,
               ((doc_id * {_KNUTH}) % {_MOD}) % {N_SHUFFLE_SHARDS} AS shard
        FROM documents
    )
    """,
    tags=("curation",),
)
def curation_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL shuffle into training shards — the step every
    pipeline runs before packing: documents land in doc_id (≈ crawl)
    order, and training wants decorrelated reads, so each document gets a
    shard (hash mod N) and a position (hash order within the shard). Zero
    engine RNG: the same Knuth multiplicative hash as the samplers, so
    the epoch-0 data order is reproducible from the constant alone. Scale
    shape: one hash shuffle on shard + per-shard sort — shards are the
    parallel unit (writers, loaders), and re-sharding for a different N
    is the same map-only hash. Feed the output order into
    ``curation_pack_sequences`` for shuffled context-window packing."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(_KNUTH)) % F.lit(_MOD)
    w = W.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        d.select(
            "doc_id",
            h.alias("h"),
            (h % F.lit(N_SHUFFLE_SHARDS)).alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w) - 1)
        .select("doc_id", "shard", "pos")
    )


@register(
    "rag_chunk_documents",
    """
    SELECT doc_id, chunk_id,
           CAST(len(c) AS BIGINT) AS n_tok,
           array_to_string(c, ' ') AS chunk_text
    FROM (
        SELECT doc_id, s AS chunk_id, list_slice(t, s, s + 31) AS c
        FROM (
            SELECT doc_id, t,
                   unnest(generate_series(1, greatest(len(t) - 8, 1), 24)) AS s
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
    )
    """,
    tags=("curation", "rag"),
)
def rag_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking: split every document into overlapping 32-token
    windows with stride 24 (8-token overlap) — the retrieval-index
    preprocessing step (each chunk then gets embedded and lands in the ANN
    index, `similarity_ann_ivf`'s input shape). Start offsets are
    ``sequence(1, max(n_tok-8, 1), 24)``: the final window is dropped only
    when it would contribute fewer than 8 unseen tokens; short documents
    yield one whole-document chunk.

    Scale shape: map-only — tokenize, explode the start-offset sequence,
    slice. No shuffle at all (the explode is in-partition), so chunking
    100 TB is embarrassingly parallel and pipelines straight into the
    embedding UDF without landing intermediates."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(8), F.lit(1)), F.lit(24)
    )
    chunk = F.slice(F.col("t"), F.col("chunk_id"), 32)
    return (
        d.select("doc_id", toks.alias("t"), F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_tok"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


# --- end-to-end curation pipeline (round 6) -------------------------------
#: quality gate: too short, or >2% repeated 3-grams (boilerplate).
QUAL_MIN_TOK = 20
QUAL_REP_X50 = 50  # (n3 - distinct3) * 50 > n3  ⇔  rep_frac > 2%


def pipeline_flag_frame(d: DataFrame) -> DataFrame:
    """One row per document with the four independent curation flags:

    - ``qf`` quality fail (short doc OR repeated-3-gram boilerplate),
    - ``ed`` exact duplicate (not the first occurrence of its text),
    - ``nd`` near duplicate (appears as the LATER side of a verified
      MinHash-LSH pair, md5 base hash — keep-earliest greedy),
    - ``cd`` contaminated (training doc sharing a 13-gram with the eval
      docs 0..EVAL_DOCS-1).

    Flags are computed independently over the full corpus (each measures
    its stage's true positive set; the kept set requires all four clear).
    Scale shape: quality is map-only; exact-dup is one window over
    md5(text); near-dup is the banded-LSH pipeline (band-key shuffle
    only); contamination is explode → broadcast-semi-join. The flag sets
    joined back are drop-lists (≪ corpus) and ride broadcasts."""
    from pyspark.sql import Window as W

    from .dedup import (
        _lsh_verified_pairs,
        minhash_signature,
        shingle_hashes_md5,
        with_sh,
    )

    # toks bound as a projected column: the 3-gram lambda then captures
    # an attribute instead of re-splitting the text per gram (see
    # dedup.shingles_toks, r16).
    bt = d.select(
        "doc_id", "text", "lang", "source",
        F.split("text", " ").alias("__toks"),
    )
    toks = F.col("__toks")
    # TRUE (non-distinct) 3-gram list — `shingles()` applies array_distinct
    # for Jaccard, which would make (n3 - d3) identically zero here; the
    # repetition signal needs the multiset (same formulation as
    # curation_repetition_score). Guarded: <3 tokens → empty list.
    grams3 = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            # slice+array_join: 2 interpreted nodes/gram vs 4 (r16,
            # tools/exp_decon_gram_shape.py — HOF lambdas don't codegen)
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = bt.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(toks).alias("ntok"),
        # n3 == |grams3| == ntok-2 (guarded): computing it arithmetically
        # skips a SECOND full gram-array build (size(transform(...))
        # evaluates the transform; the oracle's greatest(len-2, 0) is the
        # same quantity)
        F.greatest(F.size(toks) - 2, F.lit(0)).alias("n3"),
        F.size(F.array_distinct(grams3)).alias("d3"),
    )
    qf = (F.col("ntok") < QUAL_MIN_TOK) | (
        (F.col("n3") - F.col("d3")) * QUAL_REP_X50 > F.col("n3")
    )
    w_exact = W.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")

    s = (
        with_sh(d, "doc_id")
        .withColumn("hashes", shingle_hashes_md5(F.col("sh")))
        .withColumn("sig", minhash_signature(F.col("hashes")))
        .drop("hashes")
        # materialization barrier — persist(), NOT a repartition Exchange:
        # per-branch column pruning splits a reused Exchange into
        # per-consumer subtrees so the shingle transform runs ~2x; the
        # InMemoryRelation serves band + verify consumers from one
        # materialization (the _lsh_verified_pairs caller contract,
        # measured ~25% in dedup.py — this caller predated that fix).
        .persist()
    )
    near = (
        _lsh_verified_pairs(s)
        .select(F.col("doc_b").alias("nd_id"))
        .distinct()
    )

    # bound-toks form, same rationale as the grams3 block above
    bd = d.select("doc_id", F.split("text", " ").alias("__dtoks"))
    t = F.col("__dtoks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (DECON_N - 1)),
        lambda i: F.md5(F.array_join(F.slice(t, i, DECON_N), " ")),
    )
    g = bd.filter(F.size(t) >= DECON_N).select(
        "doc_id", F.explode(grams).alias("g")
    )
    ev = g.filter(F.col("doc_id") < EVAL_DOCS).select("g").distinct()
    contam = (
        g.filter(F.col("doc_id") >= EVAL_DOCS)
        .join(F.broadcast(ev), "g")
        .select(F.col("doc_id").alias("cd_id"))
        .distinct()
    )

    return (
        base.withColumn("qf", qf.cast("int"))
        .withColumn("ed", (F.row_number().over(w_exact) > 1).cast("int"))
        .join(F.broadcast(near), F.col("doc_id") == F.col("nd_id"), "left")
        .withColumn("nd", F.col("nd_id").isNotNull().cast("int"))
        .drop("nd_id")
        .join(F.broadcast(contam), F.col("doc_id") == F.col("cd_id"), "left")
        .withColumn("cd", F.col("cd_id").isNotNull().cast("int"))
        .drop("cd_id")
    )


KEPT_COND_SQL = f"doc_id >= {EVAL_DOCS} AND qf = 0 AND ed = 0 AND nd = 0 AND cd = 0"


def _pipeline_stats_sql() -> str:
    from .dedup import _md5_lsh_sql

    return "WITH " + _md5_lsh_sql(
        f"""
    , near AS (SELECT DISTINCT doc_b AS doc_id FROM verified WHERE jac >= 0.5),
    base AS (SELECT doc_id, len(string_split(text, ' ')) AS ntok
             FROM documents),
    g3 AS (
        SELECT doc_id,
               greatest(len(string_split(text, ' ')) - 2, 0) AS n3,
               len(list_distinct(list_transform(
                   range(1, len(string_split(text, ' ')) - 1),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]))) AS d3
        FROM documents
    ),
    q AS (
        SELECT b.doc_id, b.ntok,
               CASE WHEN b.ntok < {QUAL_MIN_TOK}
                      OR (g3.n3 - g3.d3) * {QUAL_REP_X50} > g3.n3
                    THEN 1 ELSE 0 END AS qf
        FROM base b JOIN g3 ON g3.doc_id = b.doc_id
    ),
    ex AS (
        SELECT doc_id,
               CASE WHEN row_number() OVER (PARTITION BY md5(text)
                                            ORDER BY doc_id) > 1
                    THEN 1 ELSE 0 END AS ed
        FROM documents
    ),
    toks13 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams13 AS (
        SELECT doc_id, md5(array_to_string(t[i:i+{DECON_N - 1}], ' ')) AS g
        FROM toks13, unnest(range(1, len(t) - {DECON_N - 2})) AS r(i)
        WHERE len(t) >= {DECON_N}
    ),
    ev13 AS (SELECT DISTINCT g FROM grams13 WHERE doc_id < {EVAL_DOCS}),
    contam AS (SELECT DISTINCT doc_id FROM grams13 JOIN ev13 USING (g)
               WHERE doc_id >= {EVAL_DOCS}),
    flags AS (
        SELECT q.doc_id, q.ntok, q.qf, ex.ed,
               CASE WHEN near.doc_id IS NOT NULL THEN 1 ELSE 0 END AS nd,
               CASE WHEN contam.doc_id IS NOT NULL THEN 1 ELSE 0 END AS cd
        FROM q JOIN ex ON q.doc_id = ex.doc_id
        LEFT JOIN near ON near.doc_id = q.doc_id
        LEFT JOIN contam ON contam.doc_id = q.doc_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(qf) AS BIGINT) AS n_quality_fail,
           CAST(sum(ed) AS BIGINT) AS n_exact_dup,
           CAST(sum(nd) AS BIGINT) AS n_near_dup,
           CAST(sum(cd) AS BIGINT) AS n_contaminated,
           CAST(sum(CASE WHEN {KEPT_COND_SQL} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN {KEPT_COND_SQL} THEN ntok ELSE 0 END) AS BIGINT)
               AS tok_kept
    FROM flags
    """
    )


@register("curation_pipeline_stats", _pipeline_stats_sql(), tags=("curation",))
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE curation pipeline — quality gate, exact dedup, MinHash
    near-dedup, 13-gram decontamination — composed and reduced to its
    per-stage drop counts plus the kept-corpus token total, as ONE
    fully-DuckDB-oracled query (the near-dup stage rides the bit-exact
    md5 LSH). This is the end-to-end verification that the stages compose
    correctly, not just work in isolation; `plans/curate.py::curate_corpus`
    is the materializing job built on the same flag frame."""
    d = spread(load(spark, sf_dir, "documents"))
    f = pipeline_flag_frame(d)
    kept = (
        (F.col("doc_id") >= EVAL_DOCS)
        & (F.col("qf") == 0)
        & (F.col("ed") == 0)
        & (F.col("nd") == 0)
        & (F.col("cd") == 0)
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("qf").alias("n_quality_fail"),
        F.sum("ed").alias("n_exact_dup"),
        F.sum("nd").alias("n_near_dup"),
        F.sum("cd").alias("n_contaminated"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("ntok")).otherwise(0)).alias("tok_kept"),
    )


@register(
    "curation_train_val_split",
    f"""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (
        SELECT doc_id, text,
               CASE WHEN (doc_id * {_KNUTH}) % {_MOD} % 1000 < 980 THEN 'train'
                    WHEN (doc_id * {_KNUTH}) % {_MOD} % 1000 < 990 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split
    ORDER BY split
    """,
    tags=("curation",),
)
def curation_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 98/1/1 train/val/test split: the assignment is a pure
    function of doc_id (Knuth multiplicative hash permille — zero engine
    RNG, same constant as the samplers), so the split is reproducible
    across runs, engines, and re-shards, and any document's membership
    can be recomputed from its id alone. Reported as per-split doc/token
    totals.

    Scale shape: the split column is map-only; the summary is a 3-group
    two-phase aggregate. Writing the actual splits is
    ``df.withColumn("split", ...).write.partitionBy("split")`` — same
    expression, no shuffle beyond the writer's."""
    d = load(spark, sf_dir, "documents")
    permille = ((F.col("doc_id") * _KNUTH) % _MOD) % 1000
    split = (
        F.when(permille < 980, "train")
        .when(permille < 990, "val")
        .otherwise("test")
    )
    return (
        d.select(
            "doc_id",
            split.alias("split"),
            F.size(F.split(F.col("text"), " ")).alias("ntok"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


@register(
    "curation_pack_efficiency",
    f"""
    WITH t AS (
        SELECT doc_id,
               doc_id % {PACK_SHARDS} AS shard,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, n_tokens,
               coalesce(sum(n_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS prior
        FROM t
    ),
    b AS (
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(floor(prior / {PACK_BUDGET}) AS BIGINT) AS bin,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM c
    )
    SELECT shard, bin,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
           CAST(round(least(sum(n_tokens), {PACK_BUDGET}) * 1000000.0
                / {PACK_BUDGET}) AS BIGINT) AS fill_ppm
    FROM b GROUP BY shard, bin
    """,
    tags=("curation",),
)
def curation_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over `curation_pack_sequences`' layout:
    per (shard, bin) — document count, token total, and fill rate in
    parts-per-million of the {PACK_BUDGET}-token budget (capped at 1e6:
    the greedy packer lets the LAST document of a bin overflow, and the
    overflow tokens belong to the straddling document, not to spare
    capacity). This is the report a training-data run checks before
    shipping shards: systematically low fill means the budget dwarfs the
    documents (pack more aggressively or concatenate), a long tail of
    single-doc bins means oversized documents need splitting upstream.
    Exact-integer ppm keeps the ratio hash-checkable cross-engine. Same
    one-window-per-shard plan as the packer itself; the audit adds one
    map-side-combined aggregate."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    binned = t.select(
        F.col("shard").cast("bigint").alias("shard"),
        F.floor(prior / PACK_BUDGET).cast("bigint").alias("bin"),
        "n_tokens",
    )
    return binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(
            F.least(F.sum("n_tokens"), F.lit(PACK_BUDGET))
            * 1_000_000.0
            / PACK_BUDGET
        )
        .cast("bigint")
        .alias("fill_ppm"),
    )


#: Gopher repetition battery n-gram sizes (Rae et al. 2021, Table A1):
#: the TOP-n-gram character fraction for small n (one dominant bigram =
#: boilerplate), the DUPLICATED-n-gram character fraction for large n
#: (long repeated spans = template/machine-generated text).
_GOPHER_TOP_NS = (2, 3, 4)
_GOPHER_DUP_NS = (5, 6, 7, 8, 9, 10)


def _gopher_sql() -> str:
    """DuckDB mirror of the Gopher n-gram repetition battery. Per n, one
    unnest of the document's n-grams; per (doc, n): the top gram by
    (count DESC, gram ASC) and the duplicated-gram char mass
    Σ (count−1)·len(gram). Assembled wide by conditional max, LEFT-joined
    so every document keeps a row (short docs score 0)."""
    per_n = []
    for n in _GOPHER_TOP_NS + _GOPHER_DUP_NS:
        gram = " || ' ' || ".join(
            f"string_split(text, ' ')[i + {j}]" for j in range(n)
        )
        per_n.append(
            f"SELECT doc_id, {n} AS n, unnest(list_transform("
            f"range(1, len(string_split(text, ' ')) - {n - 1} + 1),"
            f" i -> {gram})) AS gram FROM documents"
        )
    union = "\n        UNION ALL\n        ".join(per_n)
    top_cols = ", ".join(
        f"round(coalesce(max(CASE WHEN n = {n} THEN top_chars END)"
        f" / chars, 0), 6) AS top{n}_char_frac"
        for n in _GOPHER_TOP_NS
    )
    dup_cols = ", ".join(
        f"round(coalesce(max(CASE WHEN n = {n} THEN dup_chars END)"
        f" / chars, 0), 6) AS dup{n}_char_frac"
        for n in _GOPHER_DUP_NS
    )
    return f"""
    WITH g AS (
        {union}
    ),
    counts AS (
        SELECT doc_id, n, gram, count(*) AS c FROM g
        GROUP BY doc_id, n, gram
    ),
    top1 AS (
        SELECT doc_id, n, c * len(gram) AS top_chars FROM (
            SELECT doc_id, n, gram, c, row_number() OVER (
                PARTITION BY doc_id, n ORDER BY c DESC, gram ASC) AS rn
            FROM counts
        ) WHERE rn = 1
    ),
    dups AS (
        SELECT doc_id, n,
               sum((c - 1) * len(gram)) FILTER (WHERE c >= 2) AS dup_chars
        FROM counts GROUP BY doc_id, n
    ),
    agg AS (
        SELECT t.doc_id, t.n, t.top_chars, coalesce(d.dup_chars, 0) AS dup_chars
        FROM top1 t JOIN dups d ON d.doc_id = t.doc_id AND d.n = t.n
    )
    SELECT doc_id, {top_cols}, {dup_cols}
    FROM (
        SELECT dd.doc_id, len(dd.text)::DOUBLE AS chars, a.n,
               a.top_chars, a.dup_chars
        FROM documents dd LEFT JOIN agg a ON a.doc_id = dd.doc_id
    )
    GROUP BY doc_id, chars
    """


@register("curation_gopher_repetition", _gopher_sql(), tags=("curation",))
def curation_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition battery (Rae et al. 2021, Table A1) — the
    production pretraining quality-filter set beyond the single
    repeated-3-gram score: per document,

    - ``top{2,3,4}_char_frac`` — characters covered by the MOST FREQUENT
      n-gram (occurrences × n-gram length / doc length): one dominant
      bigram/trigram is the boilerplate signature;
    - ``dup{5..10}_char_frac`` — characters wasted on REPEATS of any
      duplicated n-gram (Σ (count−1) × length / doc length): long
      repeated spans are the template/machine-generated signature.
      The (count−1) form counts only the redundant occurrences, so a
      clean document scores exactly 0 and the metric is insensitive to
      overlap double-counting ambiguities the position-marking variant
      has.

    Line/paragraph duplicate fractions (the battery's other half) are
    omitted: this corpus is single-line by construction — they would be
    degenerate constants, not signals.

    Plan shape — the scalable formulation, NOT per-row O(L²) HOFs: a
    9-branch union (one per n, mirroring the oracle's UNION ALL), each
    branch exploding the start indexes (``sequence``) and computing the
    gram with one codegen'd ``slice`` + ``array_join`` per exploded row,
    then two hash aggregations keyed by (doc_id, n, gram) and
    (doc_id, n) — per-doc statistics never shuffle across documents,
    AQE coalesces the post-agg partitions, and the wide 9-column row
    assembles with one conditional-aggregation pivot. Note the union's 9
    scan+spread subtrees do NOT runtime-dedupe: the per-n size filter is
    pushed below each branch's spread() repartition, so the subtrees
    differ per n and each executes its own scan+exchange (only the
    duplicated counts-aggregate exchange reuses); the single-pass
    exploded-n shape was A/B'd in tools/exp_gopher_full_ab.py.
    Round 15: this REPLACED the original one-pass shape (per document,
    9 ``transform`` arrays of (n, gram) structs flattened into one
    ~9·L-element array, then a single explode) — higher-order functions
    run INTERPRETED with a per-element struct allocation, measured
    64–70 JVM-CPU-s for the explode stage vs 3.9–6.4 for this shape
    (tools/exp_gopher_shape.py, identity-asserted; steady wall 2.6→0.4 s
    for the explode, full query −45% wall in the fresh-session A/B).
    Top-gram tie-break is (count DESC, gram ASC) on both engines. Every
    score is a ratio of integer counts and lengths — fully
    DuckDB-oracled."""
    from functools import reduce

    from pyspark.sql import Window as W

    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", "text", F.length("text").cast("double").alias("chars")
    )
    dt = d.select(
        "doc_id", "chars", F.split(F.col("text"), " ").alias("toks")
    )

    def gram_rows(n: int) -> DataFrame:
        # the size filter guards sequence(a, b) DESCENDING when a > b:
        # short docs contribute no grams for this n instead of a
        # phantom descending index range
        return (
            dt.filter(F.size("toks") >= n)
            .select(
                "doc_id",
                "chars",
                F.lit(n).alias("n"),
                "toks",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1))
                ).alias("i"),
            )
            .select(
                "doc_id",
                "chars",
                "n",
                F.array_join(
                    F.slice("toks", F.col("i"), n), " "
                ).alias("gram"),
            )
        )

    ex = reduce(
        DataFrame.unionAll,
        [gram_rows(n) for n in _GOPHER_TOP_NS + _GOPHER_DUP_NS],
    )
    counts = ex.groupBy("doc_id", "chars", "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("doc_id", "n").orderBy(F.desc("c"), F.asc("gram"))
    top1 = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n",
            (F.col("c") * F.length("gram")).cast("double").alias("top_chars"),
        )
    )
    dups = counts.groupBy("doc_id", "n").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("c") >= 2, (F.col("c") - 1) * F.length("gram")
                )
            ),
            F.lit(0),
        )
        .cast("double")
        .alias("dup_chars")
    )
    agg = top1.join(dups, ["doc_id", "n"])
    frac = lambda num: F.round(  # noqa: E731
        F.coalesce(F.max(num) / F.first("chars"), F.lit(0.0)), 6
    )
    wide = (
        d.select("doc_id", "chars")
        .join(agg, "doc_id", "left")
        .groupBy("doc_id")
        .agg(
            *[
                frac(
                    F.when(F.col("n") == n, F.col("top_chars"))
                ).alias(f"top{n}_char_frac")
                for n in _GOPHER_TOP_NS
            ],
            *[
                frac(
                    F.when(F.col("n") == n, F.col("dup_chars"))
                ).alias(f"dup{n}_char_frac")
                for n in _GOPHER_DUP_NS
            ],
        )
    )
    return wide
