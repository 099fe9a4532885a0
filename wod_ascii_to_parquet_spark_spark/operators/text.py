"""Text-analysis operators for LLM-data pipelines (driver contract §extensions).

All of these run over ``documents.text`` as pure Catalyst expressions
(split/filter/transform/regexp/md5) — no Python in the row path, so they
whole-stage-codegen and scale linearly with input bytes: the shape that
matters when the corpus is 100 TB, where every operator here is a
map-only pass (no shuffle) except the final fingerprint grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, spread

#: Tiny deterministic stopword lists per language for the n-gram/stopword
#: heuristics. Chosen from the synthetic corpus vocabulary; the point is the
#: operator shape (marker-hit scoring), not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "es": ["el", "la", "de", "y", "un"],
}

_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _toks(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def _nhits(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


@register(
    "text_tokens",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
           len(list_filter(string_split(text, ' '),
                           t -> list_contains(['the','a','of','and','to'], t)))
               AS n_stopwords
    FROM documents
    """,
    tags=("text",),
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + distinct + stopword counting (SURVEY §2.11
    ``text_tokens``)."""
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        _nhits(toks, STOPWORDS["en"]).alias("n_stopwords"),
    )


@register(
    "text_token_bpe",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens
    FROM documents
    """,
    tags=("text",),
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token count (letter runs / digit runs / single
    punctuation) — the cheap proxy for tokenizer-cost estimation over a
    pretraining corpus."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.regexp_count("text", F.lit(_BPE_RE)).alias("n_bpe_tokens")
    )


@register(
    "text_quality",
    """
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           round(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE
                 / length(text), 6) AS punct_ratio,
           round(len(list_filter(string_split(text, ' '),
                                 t -> list_contains(['the','a','of','and','to'], t)))
                 ::DOUBLE / len(string_split(text, ' ')), 6) AS stopword_ratio,
           round(length(text)::DOUBLE / len(string_split(text, ' ')), 6)
               AS avg_token_len,
           CASE WHEN length(text) >= 100
                 AND len(string_split(text, ' ')) >= 20
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    """,
    tags=("text",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gates: length / punctuation / stopword ratios +
    a boolean keep decision."""
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    n_tok = F.size(toks).cast("double")
    txt_len = F.length("text").cast("double")
    return d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
            / txt_len,
            6,
        ).alias("punct_ratio"),
        F.round(_nhits(toks, STOPWORDS["en"]).cast("double") / n_tok, 6).alias(
            "stopword_ratio"
        ),
        F.round(txt_len / n_tok, 6).alias("avg_token_len"),
        F.when((F.length("text") >= 100) & (F.size(toks) >= 20), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


_LANG_HIT_SQL = {
    lang: (
        "len(list_filter(string_split(text, ' '), t -> list_contains(["
        + ",".join(f"'{w}'" for w in words)
        + "], t)))"
    )
    for lang, words in STOPWORDS.items()
}


@register(
    "text_langid",
    f"""
    SELECT doc_id,
           {_LANG_HIT_SQL['en']} AS hits_en,
           {_LANG_HIT_SQL['de']} AS hits_de,
           {_LANG_HIT_SQL['es']} AS hits_es,
           CASE
             WHEN {_LANG_HIT_SQL['en']} >= {_LANG_HIT_SQL['de']}
              AND {_LANG_HIT_SQL['en']} >= {_LANG_HIT_SQL['es']} THEN 'en'
             WHEN {_LANG_HIT_SQL['de']} >= {_LANG_HIT_SQL['es']} THEN 'de'
             ELSE 'es'
           END AS lang_guess
    FROM documents
    """,
    tags=("text",),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by stopword-marker hit counts with a deterministic
    argmax tie order (en > de > es). Map-only; at 100 TB this is the
    standard first-pass corpus router."""
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    hits = {lang: _nhits(toks, words) for lang, words in STOPWORDS.items()}
    guess = (
        F.when((hits["en"] >= hits["de"]) & (hits["en"] >= hits["es"]), "en")
        .when(hits["de"] >= hits["es"], "de")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        hits["en"].alias("hits_en"),
        hits["de"].alias("hits_de"),
        hits["es"].alias("hits_es"),
        guess.alias("lang_guess"),
    )


@register(
    "text_edit_distance",
    """
    WITH names AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey < 30)
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM names a JOIN names b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    tags=("text", "dedup"),
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit-distance near-match pairs over a bounded block —
    the character-level arm of the fuzzy-matching family (n-gram/MinHash
    operate on token level). Same confinement rule as every dedup arm:
    edit distance is O(len²) per pair, so pairs come from a block/candidate
    set, never the full corpus."""
    names = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 30)
        .select("c_custkey", "c_name")
    )
    a = names.select(F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"))
    b = names.select(F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .filter(dist <= 2)
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)


@register(
    "text_fingerprint",
    f"""
    SELECT fp, min(doc_id) AS keep_doc_id, count(*) AS n_docs
    FROM (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents)
    GROUP BY fp
    """,
    tags=("text", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over case/punct/whitespace-normalized
    text, grouped into clusters with a deterministic survivor. The exact
    arm of the dedup family — one map pass + one hash shuffle on the
    16-byte fingerprint (not the document bytes), which is what makes it
    viable at 100 TB."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        d.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs"))
    )


_PII_EMAIL = "[a-z]+@[a-z]+\\.[a-z]+"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_scrub",
    f"""
    WITH injected AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 3 = 0
                            THEN ' contact bob@example.com now'
                            WHEN doc_id % 3 = 1
                            THEN ' call 555-123-4567 or 555-987-6543'
                            ELSE '' END AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM injected
    """,
    tags=("text",),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every pretraining pipeline runs
    before publishing a corpus: detect + replace email/phone patterns,
    report per-document match counts and the scrubbed content hash.

    The synthetic corpus contains no real PII, so both engines INJECT
    deterministic markers first (same CASE on doc_id) — the oracle then
    proves detection counts and the scrubbed bytes, not just a no-op pass.
    All regex work is JVM-side ``regexp_extract_all``/``regexp_replace``
    (map-only, no shuffle); swapping in production patterns (SSNs, IBANs,
    addresses) changes only the literals. Dialect note: DuckDB
    ``regexp_replace`` needs the ``'g'`` flag for global replacement;
    Spark's replaces all matches by default."""
    d = spread(load(spark, sf_dir, "documents"))
    raw = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" contact bob@example.com now"))
        .when(F.col("doc_id") % 3 == 1, F.lit(" call 555-123-4567 or 555-987-6543"))
        .otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(_PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "join_fuzzy_blocked",
    """
    WITH n AS (
        SELECT c_custkey, c_name,
               substring(c_name, 1, length(c_name) - 1) AS blk
        FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           levenshtein(a.c_name, b.c_name) AS edit_dist
    FROM n a JOIN n b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    tags=("text", "dedup", "join"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string JOIN at scale shape: candidate pairs come from an
    EQUI-join on a blocking key (here the name minus its last character;
    real pipelines use length-bucket + phonetic/prefix keys), then the
    O(len²) levenshtein verify runs only inside blocks — the string
    counterpart of the LSH-band / IVF-cell discipline. Contrast
    ``text_edit_distance``, which brute-forces a bounded 30-name block:
    this one processes the FULL table and still touches Σ|block|² pairs,
    never N². Pairs straddling a block boundary are the (tunable) recall
    loss, exactly as with every other blocked dedup arm."""
    n = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("blk"),
    )
    a = n.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "blk",
    )
    b = n.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "blk",
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(dist <= 2)
        .select("key_a", "key_b", dist.alias("edit_dist"))
    )


@register(
    "udtf_ngram_expand",
    """
    SELECT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS gram
    FROM (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    )
    """,
    tags=("udtf", "text"),
)
def udtf_ngram_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf``) invoked via LATERAL join —
    the table-function API surface itself, distinct from the
    ``mapInPandas`` decoder (`udtf_parse_casts`): one input row yields
    n−2 output rows of word 3-grams, planned as an
    ``ArrowEvalPythonUDTF`` node (``useArrow=True`` — rows cross the
    Python boundary in Arrow batches, not pickled one at a time; the
    registry-wide plan lint bans ``BatchEvalPython``).

    Scale note: even Arrow-batched, a Python UDTF is the SLOW path — it
    exists here as API parity (and for logic that is genuinely per-row
    generative); the same expansion in the hot path is the pure-Catalyst
    explode in ``corpus_ngram_topk``/`rag_chunk_documents`, and the
    oracle below is exactly that formulation — so the UDTF is verified
    against the JVM-side equivalent."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, gram: string", useArrow=True)
    class NGrams:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
            if text is None:
                return  # match the oracle: NULL docs yield no rows
            toks = text.split(" ")
            for i in range(len(toks) - 2):
                yield doc_id, " ".join(toks[i : i + 3])

    spark.udtf.register("wg_ngram_udtf", NGrams)
    spread(load(spark, sf_dir, "documents")).createOrReplaceTempView(
        "wg_udtf_docs"
    )
    return spark.sql(
        "SELECT g.doc_id, g.gram"
        " FROM wg_udtf_docs t, LATERAL wg_ngram_udtf(t.doc_id, t.text) g"
    )


@register(
    "text_quality_logistic",
    """
    WITH f AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               len(list_filter(string_split(text, ' '),
                               t -> list_contains(['the','a','of','and','to'], t)))
                   AS n_stop,
               length(text) AS n_len
        FROM documents
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(
               -2.0
               + 6.0 * (n_stop / CAST(n_tok AS DOUBLE))
               + 0.3 * (n_len / CAST(n_tok AS DOUBLE))
               + 0.2 * ln(n_tok)
           ))), 6) AS q_score,
           CASE WHEN round(1.0 / (1.0 + exp(-(
               -2.0
               + 6.0 * (n_stop / CAST(n_tok AS DOUBLE))
               + 0.3 * (n_len / CAST(n_tok AS DOUBLE))
               + 0.2 * ln(n_tok)
           ))), 6) >= 0.5 THEN 1 ELSE 0 END AS accept
    FROM f
    """,
    tags=("text",),
)
def text_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring as a CLASSIFIER IN THE PLAN: a logistic
    regression over the heuristic features (stopword density, average
    token length, log document length) evaluated as a pure Catalyst
    expression — the deployment shape of fastText/DSIR-style quality
    filters at 100 TB, where the trained model's linear layer is folded
    into the scan (map-only, codegen'd, no Python) instead of shipped as
    a UDF. Weights here are fixed literals standing in for trained
    coefficients; the accept gate compares the ROUNDED score so the
    cross-engine decision boundary is identical even at float-ulp
    distance. Complements `text_quality` (the hard-threshold gates) and
    `corpus_surprisal` (the unigram-LM arm)."""
    d = load(spark, sf_dir, "documents")
    toks = _toks()
    n_tok = F.size(toks).cast("double")
    z = (
        F.lit(-2.0)
        + 6.0 * (_nhits(toks, STOPWORDS["en"]).cast("double") / n_tok)
        + 0.3 * (F.length("text").cast("double") / n_tok)
        + 0.2 * F.log(F.size(toks).cast("double"))
    )
    score = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    return d.select(
        "doc_id",
        score.alias("q_score"),
        F.when(score >= 0.5, 1).otherwise(0).alias("accept"),
    )


@register(
    "udtf_analyze_top_terms",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    c AS (SELECT doc_id, term, count(*) AS n FROM tok GROUP BY doc_id, term),
    r AS (
        SELECT doc_id, term,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY n DESC, term
               ) AS rn
        FROM c
    )
    SELECT doc_id,
           max(CASE WHEN rn = 1 THEN term END) AS term_1,
           max(CASE WHEN rn = 2 THEN term END) AS term_2,
           max(CASE WHEN rn = 3 THEN term END) AS term_3
    FROM r GROUP BY doc_id
    """,
    tags=("udtf", "text"),
)
def udtf_analyze_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 UDTF ``analyze`` API: the function's OUTPUT SCHEMA is
    computed at plan time from its arguments — here the constant ``k=3``
    becomes columns ``term_1..term_3`` (pass a different literal, get a
    different table shape), which a fixed ``returnType`` string cannot
    express. ``eval`` emits each document's k most frequent tokens (ties
    broken by token ascending, padded with NULL). Complements
    ``udtf_ngram_expand`` (fixed-schema ``@udtf``); the oracle recomputes
    the same top-k as a count → row_number → CASE-pivot, so the
    dynamic-schema surface is value-verified, not just runnable."""
    from collections import Counter

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class TopTerms:
        @staticmethod
        def analyze(
            doc_id: AnalyzeArgument, text: AnalyzeArgument, k: AnalyzeArgument
        ) -> AnalyzeResult:
            if not k.isConstantExpression:
                raise ValueError("top_terms: k must be a constant literal")
            schema = StructType().add("doc_id", LongType())
            for i in range(int(k.value)):
                schema = schema.add(f"term_{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, doc_id, text, k):  # noqa: ANN001 — UDTF protocol
            if text is None:
                return  # match the oracle: NULL docs yield no rows
            counts = Counter(text.split(" "))
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            terms = [t for t, _ in top] + [None] * (k - len(top))
            yield (doc_id, *terms[:k])

    spark.udtf.register("wg_top_terms_udtf", udtf(TopTerms, useArrow=True))
    spread(load(spark, sf_dir, "documents")).createOrReplaceTempView(
        "wg_udtf_docs2"
    )
    return spark.sql(
        "SELECT g.* FROM wg_udtf_docs2 t,"
        " LATERAL wg_top_terms_udtf(t.doc_id, t.text, 3) g"
    )
