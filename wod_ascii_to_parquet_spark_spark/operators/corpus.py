"""Corpus-level analytics: TF-IDF, n-gram statistics, embedding vector ops.

The aggregate/statistical layer of the LLM-data-pipeline surface — built
entirely from explode + groupBy + join + higher-order array functions, so
every stage is a standard shuffle Catalyst can plan (no UDFs, no driver
loops). At 100 TB: explode(tokens) multiplies rows by ~doc length — always
aggregate (map-side combine) in the same stage as the explode, never
materialize the exploded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, spread


@register(
    "corpus_ngram_topk",
    """
    SELECT ngram, n FROM (
        SELECT ngram, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, ngram) AS rn
        FROM (
            SELECT unnest(list_transform(
                       range(1, len(string_split(text, ' '))),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i+1])) AS ngram
            FROM documents
        )
        GROUP BY ngram
    ) WHERE rn <= 20
    """,
    tags=("text",),
)
def corpus_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams: explode → count → top-k. The groupBy directly
    above the explode gets map-side partial aggregation, so the shuffle
    carries (ngram, partial_count), not the exploded token stream."""
    d = spread(load(spark, sf_dir, "documents"))
    # toks bound as a projected column so the bigram lambda captures an
    # attribute, not the split() subtree (re-split per gram otherwise —
    # see dedup.shingles_toks, r16).
    b = d.select(F.split("text", " ").alias("__toks"))
    toks = F.col("__toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        b.select(F.explode(bigrams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.orderBy(F.desc("n"), F.asc("ngram")).limit(20).select("ngram", "n")
    )


@register(
    "corpus_tfidf",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf,
           round(tf.tf * ln(n.n_docs::DOUBLE / df.df), 6) AS tfidf
    FROM tf JOIN df USING (term) CROSS JOIN n
    WHERE tf.doc_id < 25
    """,
    tags=("text",),
)
def corpus_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term): two aggregations over one exploded token
    stream + a broadcast join of the (small) document-frequency dim. The
    df table is |vocabulary|-sized — broadcast it; never sort-merge the
    token stream against it."""
    d = spread(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # driver scalar: one tiny job, broadcast as literal
    return (
        tf.filter(F.col("doc_id") < 25)
        .join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


@register(
    "corpus_surprisal",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    freq AS (
        SELECT term, count(*) AS tf,
               sum(count(*)) OVER () AS total
        FROM tok GROUP BY term
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           round(sum(-ln(freq.tf / freq.total)) / count(*), 6)
               AS avg_surprisal
    FROM tok JOIN freq USING (term)
    GROUP BY doc_id
    """,
    tags=("text",),
)
def corpus_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document (mean −ln p(token) under corpus
    frequencies) — the cheap perplexity proxy used to rank pretraining
    data quality. Frequency dim is vocabulary-sized → broadcast; the token
    stream is aggregated in the same stage it is exploded."""
    d = spread(load(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # The vocabulary table is consumed twice (corpus total + broadcast
    # join side) — cache it so the token explode+groupBy runs ONCE.
    # Without the persist each consumer re-executes the full corpus
    # shuffle: ReuseExchange does not fire here because attribute
    # de-duplication gives the two freq references different expr ids.
    # Vocabulary is the bounded side (≪ corpus; it must fit to broadcast
    # at all), so pinning it is free relative to the double shuffle.
    # Session-scoped by design (the returned DataFrame references the
    # cache lazily); bench.py clearCache()s between measured runs.
    freq = (
        tok.groupBy("term").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    # Corpus total as a 1-row broadcast (the corpus_heavy_hitters
    # pattern), NOT a driver-side .first() probe — one job, no second
    # lineage execution.
    total_row = freq.agg(F.sum("tf").alias("total"))
    return (
        tok.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(total_row))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(-F.log(F.col("tf") / F.col("total")))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_surprisal"),
        )
    )


@register(
    "vector_normalize",
    """
    SELECT vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
               AS l2_norm,
           round((embedding::DOUBLE[])[1]
                 / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
               AS first_normalized
    FROM embeddings
    """,
    tags=("vector",),
)
def vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization of embedding vectors — zip_with/aggregate Catalyst
    math; the pre-processing step for cosine-as-dot-product ANN."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(F.zip_with(emb, emb, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b)
    )
    return e.select(
        "vec_id",
        F.round(norm, 6).alias("l2_norm"),
        F.round(F.element_at(emb, 1) / norm, 6).alias("first_normalized"),
    )


@register(
    "vector_quantize_int8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    s AS (
        SELECT vec_id, emb,
               list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
        FROM e
    )
    SELECT vec_id,
           round(scale, 6) AS scale_r,
           array_to_string(
               CASE WHEN scale = 0 THEN list_transform(emb, x -> 0)
                    ELSE list_transform(emb, x ->
                        greatest(-127, least(127, floor(x / scale + 0.5)))::INT)
               END, ',') AS q_csv,
           round(CASE WHEN scale = 0 THEN 0.0 ELSE list_max(
               list_transform(emb, x -> abs(x -
                   greatest(-127, least(127, floor(x / scale + 0.5))) * scale))
           ) END, 6) AS max_abs_err
    FROM s
    """,
    tags=("vector",),
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of embeddings — the storage /
    bandwidth path for vector corpora at 100 TB (4× smaller than float32,
    8× than float64; dot products stay SIMD-able). Per vector:
    ``scale = max|v|/127``; ``q_i = clamp(floor(v_i/scale + 0.5), ±127)``;
    plus the max absolute reconstruction error as a quality audit column.

    ``floor(x + 0.5)`` (round-half-up) instead of ``round()``: engines
    disagree on round()'s half-boundary behavior (Spark BigDecimal
    half-up vs DuckDB scale+rint), while floor of the identical double
    arithmetic is bit-deterministic in both — the same discipline as
    ``REV_C100_SQL``. Map-only, zero shuffle.

    The quantized vector is emitted as ``q_csv`` (comma-joined string,
    identical int formatting in both engines) rather than ``array<int>``:
    the driver's canonicalizer sorts columns through pandas, which cannot
    hash list values (r3 CORRECTNESS err: "unhashable type: 'list'")."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.array_max(F.transform(emb, lambda x: F.abs(x))) / 127.0
    s = e.select("vec_id", emb.alias("emb"), scale.alias("scale"))

    def quant(x):
        return F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.floor(x / F.col("scale") + 0.5)),
        )

    q = F.when(
        F.col("scale") == 0, F.transform(F.col("emb"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(F.col("emb"), lambda x: quant(x).cast("int"))
    )
    max_err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                F.col("emb"),
                lambda x: F.abs(x - quant(x) * F.col("scale")),
            )
        )
    )
    return s.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.concat_ws(",", q.cast("array<string>")).alias("q_csv"),
        F.round(max_err, 6).alias("max_abs_err"),
    )


@register(
    "vector_centroids",
    """
    SELECT label, CAST(pos - 1 AS INT) AS pos, round(avg(v), 6) AS centroid_val
    FROM (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               unnest(embedding::DOUBLE[]) AS v
        FROM embeddings
    )
    GROUP BY label, pos
    HAVING pos <= 8
    """,
    tags=("vector",),
)
def vector_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (first 8 dims): posexplode → groupBy(label, pos)
    avg — the k-means/IVF building block as a two-phase hash aggregation.
    At 100 TB the alternative (aggregate() over struct arrays per label)
    avoids the 64× row multiplication; explode+agg is clearer and
    map-side-combines to the same shuffle volume."""
    e = spread(load(spark, sf_dir, "embeddings"))
    return (
        e.select(
            "label", F.posexplode(F.col("embedding").cast("array<double>"))
        )
        .select("label", (F.col("pos") + 1).alias("pos"), F.col("col").alias("v"))
        .filter(F.col("pos") <= 8)
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("centroid_val"))
        .select("label", (F.col("pos") - 1).cast("int").alias("pos"), "centroid_val")
    )


# --- distributed Lloyd's k-means (library; tested vs numpy) ---------------


def _centroid_row(cents: DataFrame) -> DataFrame:
    """Fold (cell, cemb) centroids into ONE broadcastable row ``__cents``:
    array of struct(cell, cemb, bb) sorted by cell, with ``bb`` = ‖c‖²
    precomputed — the same one-row-quantizer discipline as the IVF/PQ
    codebooks (operators/similarity.py).

    Deliberately parallel to ``similarity._seed_array``/``_ivf_assign``
    rather than shared: k-means centroids are COMPUTED arrays (cell ids
    from groupBy, L2 metric) while the similarity fold carries raw medoid
    rows under the cosine-scaled metric and the oracle-visible plan
    lessons (non-nullable key, strictly-monotone fold) documented there.
    Any plan-shape fix landing in similarity.py should be mirrored
    here — both sites carry this pointer."""
    arr = cents.select(F.struct("cell", "cemb").alias("s")).agg(
        F.sort_array(F.collect_list("s")).alias("__raw")
    )
    with_bb = F.transform(
        F.col("__raw"),
        lambda s: F.struct(
            s["cell"].alias("cell"),
            s["cemb"].alias("cemb"),
            F.aggregate(
                F.transform(s["cemb"], lambda x: x * x),
                F.lit(0.0),
                lambda a, b: a + b,
            ).alias("bb"),
        ),
    )
    return arr.select(with_bb.alias("__cents"))


def _kmeans_assign(e: DataFrame, cent_row: DataFrame) -> DataFrame:
    """MAP-ONLY L2 assignment: argmin over the broadcast centroid row via
    the selection metric ``‖c‖² − 2a·c`` (the per-row ‖a‖² constant cannot
    change the argmin); strictly-less fold → lowest cell wins ties; no
    Window, no shuffle."""
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    scored = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (c["bb"] - 2 * dot(F.col("emb"), c["cemb"])).alias("dist"),
            c["cell"].alias("cell"),
        ),
    )
    init = F.struct(
        F.lit(float("inf")).alias("dist"),
        F.lit(-1).cast("long").alias("cell"),
    )
    best = F.aggregate(
        scored,
        init,
        lambda acc, x: F.when(x["dist"] < acc["dist"], x).otherwise(acc),
        lambda acc: acc["cell"],
    )
    return e.crossJoin(F.broadcast(cent_row)).select(
        "vec_id", "emb", F.coalesce(best, F.lit(-1)).alias("cell")
    )


def kmeans_lloyd(
    e: DataFrame, k: int = 16, n_iter: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over ``(vec_id, emb: array<double>)``;
    returns ``(assignments (vec_id, cell), centroids (cell, cemb))`` after
    ``n_iter`` rounds from deterministic medoid init (vec_id < k).

    The iterative-algorithm pattern alongside connected components
    (operators/dedup.py): per round one MAP-ONLY assignment against the
    broadcast one-row centroid fold + one explode→two-phase-agg centroid
    update (shuffle carries (cell, pos, partial sums) — k×dim cells, not
    the corpus), with ``localCheckpoint`` truncating the growing lineage
    exactly like the CC loop. Rounds are a fixed budget (k-means converges
    in practice long before lineage would matter); empty clusters keep no
    row and simply drop out of the fold, the standard Lloyd behavior.
    Verified against a numpy reference implementation in
    tests/test_consistency.py (assignment agreement + monotone WCSS)."""
    if n_iter < 1:
        raise ValueError(f"kmeans_lloyd needs n_iter >= 1, got {n_iter}")
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell"), F.col("emb").alias("cemb")
    )
    assign = None
    for _ in range(n_iter):
        assign = _kmeans_assign(e, _centroid_row(cents))
        cents = (
            assign.select("cell", F.posexplode("emb"))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("v"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("cemb")
            )
            .localCheckpoint()
        )
    return assign.select("vec_id", "cell"), cents


@register(
    "corpus_heavy_hitters",
    """
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT sum(c) AS n FROM cnt)
    SELECT token, CAST(c AS BIGINT) AS c
    FROM cnt CROSS JOIN tot
    WHERE c * 200 > n
    ORDER BY c DESC, token
    """,
    tags=("corpus",),
)
def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-threshold heavy hitters: tokens whose frequency exceeds
    0.5% of ALL token occurrences — the frequent-items primitive behind
    stopword induction and boilerplate detection (vs `corpus_ngram_topk`,
    which is fixed-k). The threshold is the exact integer predicate
    ``200·c > N`` so both engines agree at the boundary.

    Scale shape: map-side combine above the explode (partial counts per
    task), one hash shuffle on token, and the corpus total as a 1-row
    broadcast. The sketch alternative at extreme cardinality is
    Misra–Gries/SpaceSaving per partition + merge — same mergeable-state
    pattern as `agg_approx_count_distinct`; with support ≥ 0.5% the exact
    two-phase count is already cheap because partial aggregation bounds
    per-task state at the vocabulary actually seen."""
    d = spread(load(spark, sf_dir, "documents"))
    tok = d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # total from the (vocabulary-sized) aggregate — NOT a second scan of
    # the fact table; sum(c) == count of all token occurrences.
    tot = cnt.agg(F.sum("c").alias("n"))
    return (
        cnt.join(F.broadcast(tot))
        .filter(F.col("c") * 200 > F.col("n"))
        .select("token", "c")
        .orderBy(F.desc("c"), "token")
    )


@register(
    "corpus_zipf_fit",
    """
    WITH cnt AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ),
    ranked AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, token) AS r FROM cnt
    )
    SELECT round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6)
               AS zipf_slope,
           round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 6)
               AS fit_r2,
           CAST(count(*) AS BIGINT) AS vocab
    FROM ranked
    """,
    tags=("corpus",),
)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the token frequency distribution: regress
    log(frequency) on log(rank) — slope ≈ −1 for natural language, and a
    sharp deviation is the cheap corpus-health signal (template spam
    flattens the head, OCR noise fattens the tail). Rank ties break by
    token so both engines rank identically.

    Scale shape: token counts are the usual map-side-combined aggregate;
    the rank is one global window over the VOCABULARY (not the corpus);
    the regression is Spark's built-in ``regr_*`` two-phase aggregate."""
    d = spread(load(spark, sf_dir, "documents"))
    from pyspark.sql import Window as W

    cnt = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = cnt.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.desc("c"), F.asc("token")))
        .alias("r"),
    )
    lc = F.log(F.col("c").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lc, lr), 6).alias("fit_r2"),
        F.count(F.lit(1)).alias("vocab"),
    )


@register(
    "basket_part_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 100
    """,
    tags=("analytics",),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket 2-itemset mining: part pairs co-occurring in at
    least 2 orders — the A-priori candidate-pair step. The quadratic
    self-join is CONFINED to within-order pairs (Σ|order|², orders
    average ~7 lines), the same blocked-kernel discipline as
    `dedup_ngram_jaccard`; the join key is the orderkey hash shuffle and
    pairs aggregate map-side before the global count."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(100)
    )


@register(
    "basket_association_rules",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    singles AS (
        SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING count(*) >= 3
    ),
    orders_n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items)
    SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
           round(CAST(n_ab AS DOUBLE) / sa.n_part, 6) AS confidence,
           round(CAST(n_ab AS DOUBLE) * n_orders / (sa.n_part * sb.n_part), 6)
               AS lift
    FROM pairs
    JOIN singles sa ON sa.l_partkey = part_a
    JOIN singles sb ON sb.l_partkey = part_b
    CROSS JOIN orders_n
    ORDER BY lift DESC, part_a, part_b
    LIMIT 50
    """,
    tags=("analytics",),
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the 2-itemsets: confidence P(b|a) and lift
    P(a,b)/(P(a)P(b)) for co-purchased part pairs — the step after
    candidate mining in A-priori. All ratios divide exact integer counts
    (one rounding at the end); the total-orders scalar rides a 1-row
    broadcast. Scale shape identical to `basket_part_pairs` plus two
    partkey-keyed joins against the (part-sized) singles aggregate."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    singles = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    orders_n = items.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    sa = singles.select(
        F.col("l_partkey").alias("pa"), F.col("n_part").alias("na")
    )
    sb = singles.select(
        F.col("l_partkey").alias("pb"), F.col("n_part").alias("nb")
    )
    return (
        pairs.join(sa, F.col("part_a") == F.col("pa"))
        .join(sb, F.col("part_b") == F.col("pb"))
        .join(F.broadcast(orders_n))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double") / F.col("na"), 6
            ).alias("confidence"),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


@register(
    "corpus_bigram_surprisal",
    """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    bg AS (
        SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
        FROM t, unnest(generate_series(1, len(l) - 1)) AS s(i)
        WHERE len(l) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, sum(c) AS n1 FROM c2 GROUP BY w1)
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(sum(-log2(c2.c / c1.n1)) / count(*), 6) AS avg_bits
    FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
    GROUP BY doc_id
    """,
    tags=("text",),
)
def corpus_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM surprisal per document — mean −log₂ p(w₂|w₁) under the
    corpus's own MLE bigram model (conditional frequencies; every scored
    bigram was seen in training, so no smoothing mass is needed). One
    tier above `corpus_surprisal`'s unigram model: context-aware, so
    formulaic boilerplate scores LOW bits (predictable continuations)
    and token-salad scores HIGH — the separation the unigram proxy
    can't make.

    Shape: bigram construction is MAP-ONLY (a transform over the token
    array, no self-join); model estimation is two grouped counts; scoring
    rejoins the bigram stream to the model on (w1, w2) — the standard
    hash-shuffle LM-scoring shape whose state is the model table (corpus
    bigram vocabulary), not the corpus."""
    d = spread(load(spark, sf_dir, "documents"))
    # bound-toks form (attribute capture, not a per-element re-split —
    # see dedup.shingles_toks, r16)
    b = d.select("doc_id", F.split("text", " ").alias("__toks"))
    toks = F.col("__toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = b.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy("w1").agg(F.sum("c").alias("n1"))
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(-F.log2(F.col("c") / F.col("n1"))) / F.count(F.lit(1)),
                6,
            ).alias("avg_bits"),
        )
    )


@register(
    "corpus_kl_divergence",
    """
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    lt AS (SELECT lang, term, count(*) AS c FROM tok GROUP BY lang, term),
    l AS (SELECT lang, sum(c) AS n FROM lt GROUP BY lang),
    g AS (SELECT term, sum(c) AS ct FROM lt GROUP BY term),
    tot AS (SELECT sum(c) AS t FROM lt)
    SELECT lang,
           CAST(n AS BIGINT) AS n_tokens,
           round(sum((c / n) * log2((c / n) / (ct / t))), 6) AS kl_bits
    FROM lt JOIN l USING (lang) JOIN g USING (term) CROSS JOIN tot
    GROUP BY lang, n
    """,
    tags=("text",),
)
def corpus_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit: KL(P_lang ‖ P_corpus) in bits for each
    language slice's token distribution against the whole corpus — the
    signal a mixture rebalance or domain filter checks before/after
    (a slice at ~0 bits is distributionally redundant with the corpus; a
    high-KL slice carries distinct text). P's support is a subset of Q's
    by construction (the slice is part of the corpus), so every term has
    q > 0 and the sum is exact.

    Shape: two grouped counts on the exploded token stream (map-side
    combined), then a join on term — state is vocabulary-sized per lang.
    The per-lang totals and grand total are tiny aggregates joined back
    (1-row / |lang|-row broadcasts), never a driver collect."""
    d = spread(load(spark, sf_dir, "documents"))
    tok = d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    lt = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("c"))
    l_tot = lt.groupBy("lang").agg(F.sum("c").alias("n"))
    g_tot = lt.groupBy("term").agg(F.sum("c").alias("ct"))
    tot = lt.agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("n")
    q = F.col("ct") / F.col("t")
    return (
        lt.join(F.broadcast(l_tot), "lang")
        .join(g_tot, "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("lang", "n")
        .agg(F.round(F.sum(p * F.log2(p / q)), 6).alias("kl_bits"))
        .select("lang", F.col("n").cast("bigint").alias("n_tokens"), "kl_bits")
    )


def _rp_planes(k: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic Gaussian projection matrix (fixed seed) — plan
    literals, like the LSH hyperplanes, so both engines fold the exact
    same floats."""
    import numpy as np

    rng = np.random.default_rng(7)
    scale = 1.0 / np.sqrt(k)
    return (rng.standard_normal((k, dim)) * scale).tolist()


def _rp_oracle_sql() -> str:
    planes = _rp_planes()
    comps = ",\n           ".join(
        f"round(list_dot_product(emb, [{', '.join(repr(v) for v in p)}]), 6)"
        f" AS rp_{i}"
        for i, p in enumerate(planes[:4])
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
    SELECT vec_id,
           {comps}
    FROM e
    """


@register("vector_random_projection", _rp_oracle_sql(), tags=("vector",))
def vector_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→16 dims (1/√k-scaled
    Gaussian matrix, fixed seed): THE cheap dimensionality-reduction tier
    for embedding pipelines — pairwise distances are preserved within
    (1±ε) with high probability, so downstream clustering/ANN can run on
    a 4× smaller vector, and unlike PQ the output is still a dense vector
    usable as features. MAP-ONLY: the matrix is k plan literals; each
    output dim is one dot-product fold; no shuffle, no state. The first 4
    components are emitted (hash-checkable columns; the driver's
    canonicalizer needs scalars); the full 16-dim projection is the same
    expression repeated. Matrix literals repr-round-trip exactly, so both
    engines fold identical floats — fully oracled like the LSH arm."""
    from .similarity import _dot  # same fold the similarity tiers use

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    planes = _rp_planes()
    cols = [
        F.round(
            _dot(F.col("emb"), F.array(*[F.lit(v) for v in p])), 6
        ).alias(f"rp_{i}")
        for i, p in enumerate(planes[:4])
    ]
    return e.select("vec_id", *cols)


@register(
    "corpus_heaps_fit",
    """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    firsts AS (
        SELECT doc_id, count(*) AS new_terms
        FROM (
            SELECT term, min(doc_id) AS doc_id FROM tok GROUP BY term
        ) GROUP BY doc_id
    ),
    per_doc AS (
        SELECT t.doc_id, t.n_tok, coalesce(f.new_terms, 0) AS new_terms
        FROM (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id) t
        LEFT JOIN firsts f ON f.doc_id = t.doc_id
    ),
    growth AS (
        SELECT doc_id,
               sum(n_tok) OVER w AS cum_tokens,
               sum(new_terms) OVER w AS cum_vocab
        FROM per_doc
        WINDOW w AS (ORDER BY doc_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(cum_vocab), ln(cum_tokens)), 6)
               AS heaps_beta,
           round(exp(regr_intercept(ln(cum_vocab), ln(cum_tokens))), 4)
               AS heaps_k,
           round(regr_r2(ln(cum_vocab), ln(cum_tokens)), 6) AS r2
    FROM growth WHERE doc_id % 10 = 9 OR doc_id < 10
    """,
    tags=("text",),
)
def corpus_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit — vocabulary growth V(n) ≈ K·n^β against corpus
    size: log-log regression of cumulative distinct vocabulary on
    cumulative tokens, sampled every 10 documents in doc_id order. The
    companion corpus-health signal to `corpus_zipf_fit`: natural text
    sits at β≈0.4–0.6; β near 1 means near-disjoint vocabularies
    (unmerged sources, encoding chaos), β near 0 a closed vocabulary
    (template/boilerplate corpus). Dedup and contamination both move it.

    Cumulative-distinct without a quadratic: a term contributes at its
    FIRST document only (one group-by over the token stream), so the
    running vocabulary is a prefix-sum window over per-doc first-seen
    counts — O(tokens) total, one global-window pass over |docs| rows
    (tiny; at 100 TB sample doc checkpoints before the window)."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    per_doc_tok = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    firsts = (
        tok.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("new_terms"))
    )
    per_doc = per_doc_tok.join(firsts, "doc_id", "left").select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("new_terms"), F.lit(0)).alias("new_terms"),
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    growth = per_doc.select(
        "doc_id",
        F.sum("n_tok").over(w).alias("cum_tokens"),
        F.sum("new_terms").over(w).alias("cum_vocab"),
    ).filter((F.col("doc_id") % 10 == 9) | (F.col("doc_id") < 10))
    lx = F.log(F.col("cum_tokens"))
    ly = F.log(F.col("cum_vocab"))
    return growth.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.regr_slope(ly, lx), 6).alias("heaps_beta"),
        F.round(F.exp(F.regr_intercept(ly, lx)), 4).alias("heaps_k"),
        F.round(F.regr_r2(ly, lx), 6).alias("r2"),
    )
