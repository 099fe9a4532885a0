"""Scalar-function surface, part 2: extended string/math/date/array
functions and argmax-style aggregates — dialect-mapped to DuckDB oracles.
All whole-stage-codegen'd Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "str_funcs2",
    """
    SELECT c_custkey,
           concat(upper(left(lower(c_mktsegment), 1)),
                  substring(lower(c_mktsegment), 2)) AS seg_title,
           reverse(c_name) AS name_rev,
           translate(c_name, '#0', '_x') AS name_translated,
           repeat(c_mktsegment, 2) AS seg_twice,
           strpos(c_name, '#') AS hash_pos,
           left(c_name, 4) AS name_left,
           right(c_name, 4) AS name_right,
           trim(concat(' ', c_mktsegment, ' ')) AS seg_trimmed,
           split_part(c_name, '#', 2) AS num_part
    FROM customer
    """,
    tags=("scalar",),
)
def str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string functions: translate/repeat/strpos/left/right/trim/split_part."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.reverse("c_name").alias("name_rev"),
        F.translate("c_name", "#0", "_x").alias("name_translated"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.substring("c_name", 1, 4).alias("name_left"),
        F.substring(F.col("c_name"), -4, 4).alias("name_right"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("num_part"),
    )


@register(
    "math_funcs2",
    """
    SELECT o_orderkey,
           round(sin(o_totalprice / 100000.0), 6) AS sin_v,
           round(cos(o_totalprice / 100000.0), 6) AS cos_v,
           round(atan2(o_totalprice / 100000.0, 2.0), 6) AS atan2_v,
           round(exp(o_totalprice / 500000.0), 6) AS exp_v,
           CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS sign_v,
           round(radians(o_totalprice / 10000.0), 6) AS rad_v,
           round(log10(o_totalprice), 6) AS log10_v,
           round(cbrt(o_totalprice), 6) AS cbrt_v
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("scalar",),
)
def math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/exponential/log10/cbrt numeric kernel."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    x = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.sin(x / 100_000.0), 6).alias("sin_v"),
        F.round(F.cos(x / 100_000.0), 6).alias("cos_v"),
        F.round(F.atan2(x / 100_000.0, F.lit(2.0)), 6).alias("atan2_v"),
        F.round(F.exp(x / 500_000.0), 6).alias("exp_v"),
        F.signum(x - 250_000.0).alias("sign_v"),
        F.round(F.radians(x / 10_000.0), 6).alias("rad_v"),
        F.round(F.log10(x), 6).alias("log10_v"),
        F.round(F.cbrt(x), 6).alias("cbrt_v"),
    )


@register(
    "date_funcs2",
    """
    SELECT o_orderkey,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           quarter(o_orderdate) AS qtr,
           CASE WHEN dayofweek(o_orderdate) = 0 THEN 7
                ELSE dayofweek(o_orderdate) END AS iso_dow,
           weekofyear(o_orderdate) AS iso_week,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec,
           CAST(make_date(year(o_orderdate), month(o_orderdate), 1)
                AS TIMESTAMP) AS month_first
    FROM orders
    """,
    tags=("scalar",),
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date functions. Dialect note: Spark ``dayofweek`` is
    1=Sunday..7=Saturday; DuckDB ``dayofweek`` is 0=Sunday..6=Saturday —
    both sides normalize to ISO (1=Monday..7=Sunday)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        # TIMESTAMP, not DATE: Spark DATE reaches pandas as datetime.date
        # objects while DuckDB DATE arrives as datetime64 — the driver's
        # stringified hash would diverge. TIMESTAMP is datetime64 on both.
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekday(d).alias("__wd"),
        F.weekofyear(d).alias("iso_week"),
        F.unix_timestamp(d).alias("epoch_sec"),
        F.make_date(F.year(d), F.month(d), F.lit(1))
        .cast("timestamp")
        .alias("month_first"),
    ).select(
        "o_orderkey",
        "month_end",
        "qtr",
        (F.col("__wd") + 1).alias("iso_dow"),  # weekday: 0=Mon → ISO 1=Mon
        "iso_week",
        "epoch_sec",
        "month_first",
    )


@register(
    "array_funcs2",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
               WHERE vec_id < 50)
    SELECT vec_id,
           round(list_reduce(emb[1:4], (a, b) -> a + b), 6) AS head4_sum,
           round(list_reverse(emb)[1], 6) AS last_val,
           list_position(list_transform(emb, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 1)
               AS first_pos_idx,
           len(flatten([emb[1:2], emb[3:4]])) AS flat_len,
           round(list_sort(emb)[1], 6) AS min_via_sort
    FROM e
    """,
    tags=("scalar",),
)
def array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """slice / reverse / array_position / flatten / array_sort."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(F.slice(emb, 1, 4), F.lit(0.0), lambda a, b: a + b), 6
        ).alias("head4_sum"),
        F.round(F.element_at(F.reverse(emb), 1), 6).alias("last_val"),
        F.array_position(
            F.transform(emb, lambda x: F.when(x > 0, 1).otherwise(0)), 1
        ).alias("first_pos_idx"),
        F.size(F.flatten(F.array(F.slice(emb, 1, 2), F.slice(emb, 3, 2)))).alias(
            "flat_len"
        ),
        F.round(F.element_at(F.array_sort(emb), 1), 6).alias("min_via_sort"),
    )


@register(
    "agg_arg_minmax",
    """
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS best_order,
           arg_min(o_orderkey, o_totalprice) AS worst_order,
           round(max(o_totalprice), 2) AS best_price
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax aggregates). Deterministic here because
    o_totalprice values are distinct per status group at test SFs; ties
    would need a (value, key) struct-max formulation."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@register(
    "lateral_explode_join",
    """
    SELECT e.vec_id, t.pos, d.label,
           round(t.v, 6) AS v
    FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
          WHERE vec_id < 10) e,
         LATERAL (SELECT generate_subscripts(e.emb, 1) AS pos,
                         unnest(e.emb) AS v) t,
         (SELECT vec_id, label FROM embeddings) d
    WHERE d.vec_id = e.vec_id AND t.pos <= 4
    """,
    tags=("join",),
)
def lateral_explode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral (correlated generator) join: explode each row's array and
    join the exploded stream back to a table — generator + equi-join, no
    driver involvement."""
    e = load(spark, sf_dir, "embeddings")
    left = (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode(F.col("embedding").cast("array<double>")))
        .select("vec_id", (F.col("pos") + 1).alias("pos"), F.col("col").alias("v"))
        .filter(F.col("pos") <= 4)
    )
    labels = e.select(F.col("vec_id").alias("vid2"), "label")
    return (
        left.join(F.broadcast(labels), left.vec_id == labels.vid2)
        .select("vec_id", "pos", "label", F.round("v", 6).alias("v"))
    )


@register(
    "merge_upsert",
    """
    WITH updates AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0
    )
    SELECT o_orderkey, o_custkey, o_totalprice FROM updates
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice FROM inserts
    UNION ALL
    SELECT t.o_orderkey, t.o_custkey, t.o_totalprice
    FROM orders t
    WHERE t.o_orderkey % 10 <> 0
    """,
    tags=("etl",),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert emulation without a table format: target anti-join
    changed-keys ∪ updates ∪ inserts. The classic pre-Delta CDC pattern;
    with Delta/Iceberg on the classpath this becomes a native MERGE INTO
    (jars not in this environment — see sources/lakehouse.py)."""
    t = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # additive bump, NO rounding: prices carry >2 decimals and any round()
    # at a half-boundary diverges between engines; +1000.0 is bit-exact in
    # both, so every branch passes values through identically.
    updates = (
        t.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1000.0)
    )
    inserts = t.filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
    )
    unchanged = t.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    return unchanged.unionByName(updates).unionByName(inserts)


@register(
    "explode_outer_nulls",
    """
    WITH e AS (SELECT vec_id,
                      CASE WHEN vec_id % 7 = 0 THEN []
                           ELSE (embedding::DOUBLE[])[1:2] END AS arr
               FROM embeddings WHERE vec_id < 40)
    SELECT vec_id, round(v, 6) AS v FROM (
        SELECT vec_id, unnest(arr) AS v FROM e WHERE len(arr) > 0
        UNION ALL
        SELECT vec_id, NULL FROM e WHERE len(arr) = 0
    )
    """,
    tags=("scalar",),
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with NULL — the
    left-outer flavor of array unnesting (DuckDB emulates via UNION ALL)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    arr = F.when(
        F.col("vec_id") % 7 == 0, F.array().cast("array<double>")
    ).otherwise(F.slice(F.col("embedding").cast("array<double>"), 1, 2))
    return (
        e.select("vec_id", arr.alias("arr"))
        .select("vec_id", F.explode_outer("arr").alias("v0"))
        .select("vec_id", F.round("v0", 6).alias("v"))
    )


@register(
    "scalar_try_funcs",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_int,
           o_totalprice / nullif(CAST(o_orderkey % 3 AS DOUBLE), 0) AS safe_div,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE CAST(o_orderkey AS VARCHAR) END AS maybe_str
    FROM orders
    ORDER BY o_orderkey
    LIMIT 1000
    """,
    tags=("scalar", "ansi"),
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface under ANSI mode: ``try_cast`` of a
    non-numeric string yields NULL instead of raising, ``try_divide``
    yields NULL on division by zero (mirrored as ``/ NULLIF`` in the
    oracle — same semantics), and NULL propagation through conditional
    projection. Under Spark's ANSI default the non-``try_`` forms of
    these THROW — this query is the pattern for ingest paths that must
    absorb dirty data without failing the job."""
    k = F.col("o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_orderstatus").try_cast("int").alias("status_int"),
            F.try_divide(
                F.col("o_totalprice"), (k % 3).cast("double")
            ).alias("safe_div"),
            F.when(k % 5 == 0, F.lit(None)).otherwise(k.cast("string")).alias(
                "maybe_str"
            ),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "scalar_hash_funcs",
    """
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(text) AS BIGINT) AS n_bytes,
           upper(substring(md5(text), 1, 8)) AS bucket_hex
    FROM documents
    ORDER BY doc_id
    """,
    tags=("scalar",),
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic/content hash surface: md5 and sha2-256 digests are
    bit-identical across engines (the foundation every cross-engine
    dedup arm in this repo builds on), plus byte length and a hex bucket
    prefix — the content-addressing projection for a blob store or CAS
    layout. Engine-specific hashes (xxhash64, crc32) are deliberately
    NOT here: they power the faster rows-only arms."""
    t = F.col("text")
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.md5(t).alias("h_md5"),
            F.sha2(t, 256).alias("h_sha256"),
            F.length(t).cast("bigint").alias("n_bytes"),
            F.upper(F.substring(F.md5(t), 1, 8)).alias("bucket_hex"),
        )
        .orderBy("doc_id")
    )


@register(
    "str_funcs3",
    """
    SELECT doc_id,
           split_part(text, ' ', 2) AS second_tok,
           translate(substring(text, 1, 20), 'aeiou', '.....') AS devoweled,
           CAST(len(regexp_extract_all(text, '[st]a')) AS BIGINT) AS n_sa_ta,
           reverse(substring(text, 1, 12)) AS rev12,
           repeat(substring(text, 1, 2), 3) AS rep3
    FROM documents
    ORDER BY doc_id
    """,
    tags=("scalar",),
)
def str_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third string-surface tranche: ``split_part`` (1-based field
    extraction), ``translate`` (character mapping), ``regexp_count``
    (mirrored as ``len(regexp_extract_all)``), ``reverse``, ``repeat`` —
    all whole-stage-codegen JVM expressions."""
    t = F.col("text")
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.split_part(t, F.lit(" "), F.lit(2)).alias("second_tok"),
            F.translate(F.substring(t, 1, 20), "aeiou", ".....").alias(
                "devoweled"
            ),
            F.regexp_count(t, F.lit("[st]a")).cast("bigint").alias("n_sa_ta"),
            F.reverse(F.substring(t, 1, 12)).alias("rev12"),
            F.repeat(F.substring(t, 1, 2), 3).alias("rep3"),
        )
        .orderBy("doc_id")
    )


@register(
    "lakehouse_delete_where",
    """
    SELECT doc_id, n_chars FROM documents
    WHERE doc_id < 400 AND NOT (doc_id % 3 = 1)
    """,
    tags=("lakehouse",),
)
def lakehouse_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE on the manifest-log table
    (``sources/lakehouse.LogTable.delete_where``) under the hash gate —
    the table-side twin of the index tombstones: build the table in TWO
    commits (so the snapshot spans multiple file sets), delete every
    ``doc_id % 3 = 1`` row, and read the resulting snapshot. Only files
    containing victims are rewritten — untouched files carry into the
    new snapshot by reference, which is what bounds a takedown's cost
    by the victim rows' file locality instead of the table size; the
    by-reference and time-travel halves are pinned in
    tests/test_lakehouse.py. Oracle: plain SQL over the same rows —
    DELETE must be exactly a predicate-complement, never an
    approximation."""
    import os
    import shutil

    from ..sources.lakehouse import LogTable

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace(
        "file:", ""
    )
    root = os.path.join(warehouse, "logtable_delete_q")
    shutil.rmtree(root, ignore_errors=True)
    t = LogTable(spark, root)
    t.write(d.filter(F.col("doc_id") < 200), mode="overwrite")
    t.write(
        d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)),
        mode="append",
    )
    t.delete_where("doc_id % 3 = 1")
    return t.read()


@register(
    "lakehouse_update_where",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 1
                THEN n_chars + length(lang) ELSE n_chars END AS n_chars,
           CASE WHEN doc_id % 3 = 1
                THEN upper(lang) || CAST(n_chars AS VARCHAR) ELSE lang
                END AS lang
    FROM documents WHERE doc_id < 400
    """,
    tags=("lakehouse",),
)
def lakehouse_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write ``UPDATE … SET`` on the manifest-log table
    (``sources/lakehouse.LogTable.update_where``, VERDICT r13 #3) under
    the hash gate: build the table in TWO commits, then assign BOTH
    ``n_chars`` and ``lang`` on every ``doc_id % 3 = 1`` row — each SET
    expression reads the OTHER column, so the oracle verifies SQL
    UPDATE's simultaneous-assignment semantics (all expressions see the
    pre-update row; a sequential withColumn chain would feed one
    assignment's result into the next and fail the hash). Only files
    containing matches are rewritten — same by-reference cost model as
    ``lakehouse_delete_where``, pinned structurally in
    tests/test_lakehouse.py."""
    import os
    import shutil

    from ..sources.lakehouse import LogTable

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").replace(
        "file:", ""
    )
    root = os.path.join(warehouse, "logtable_update_q")
    shutil.rmtree(root, ignore_errors=True)
    t = LogTable(spark, root)
    t.write(d.filter(F.col("doc_id") < 200), mode="overwrite")
    t.write(
        d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)),
        mode="append",
    )
    t.update_where(
        "doc_id % 3 = 1",
        {
            "n_chars": "n_chars + length(lang)",
            "lang": "concat(upper(lang), cast(n_chars as string))",
        },
    )
    return t.read()
