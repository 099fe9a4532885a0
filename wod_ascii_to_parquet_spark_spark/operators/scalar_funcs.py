"""Scalar-function surface (SURVEY.md §2.9): string / date / math / array /
map / json.

The reference's only scalar logic is driver-side Java string handling —
prefix trim ``DatasetTrain.java:67``, key split + suffix replace
``DatasetYearTrain.java:229-233``, substring extraction
``OsPoolS3Lister.java:54``. Here the whole family is executor-side Catalyst
expressions inside whole-stage codegen — zero Python in the row path.

Dialect discipline: each oracle uses the DuckDB spelling of the same
function (e.g. Spark ``regexp_replace`` replaces all matches → DuckDB needs
the ``'g'`` flag; Spark ``log`` is natural log → DuckDB ``ln``; Spark
``datediff(end, start)`` → DuckDB ``datediff('day', start, end)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register


@register(
    "str_funcs",
    """
    SELECT c_custkey,
           substring(c_name, 1, 8) AS name_prefix,
           string_split(c_name, '#')[-1] AS name_num,
           upper(c_mktsegment) AS seg_upper,
           regexp_replace(c_name, '0', '', 'g') AS name_nozeros,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
           length(c_name) AS name_len
    FROM customer
    """,
    tags=("scalar",),
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring/split/regexp_replace/upper/concat_ws/lpad/length — the
    reference's key-name manipulation set, vectorized."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.element_at(F.split("c_name", "#"), -1).alias("name_num"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.regexp_replace("c_name", "0", "").alias("name_nozeros"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.length("c_name").alias("name_len"),
    )


@register(
    "date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           dayofmonth(o_orderdate) AS o_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
    FROM orders
    """,
    tags=("scalar",),
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp assembly/extraction — mirrors the cast Y/M/D/time →
    timestamp derivation the WOD pipeline needs (SURVEY §2.9)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@register(
    "math_funcs",
    """
    SELECT o_orderkey,
           round(o_totalprice, 1) AS price_r1,
           abs(o_totalprice - 250000.0) AS dist_mid,
           CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS price_bucket,
           CAST(ceil(o_totalprice / 10000.0) AS BIGINT) AS price_bucket_hi,
           round(ln(o_totalprice), 6) AS log_price,
           round(sqrt(o_totalprice), 6) AS sqrt_price,
           round(pow(o_totalprice / 100000.0, 2.0), 6) AS sq_norm,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7
    FROM orders
    """,
    tags=("scalar",),
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/floor/ceil/ln/sqrt/pow/pmod — the numeric kernel the
    lat/lon→geohash quantization uses (functions/geohash.py)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 250_000.0).alias("dist_mid"),
        F.floor(F.col("o_totalprice") / 10_000.0).alias("price_bucket"),
        F.ceil(F.col("o_totalprice") / 10_000.0).alias("price_bucket_hi"),
        F.round(F.log(F.col("o_totalprice")), 6).alias("log_price"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_price"),
        F.round(F.pow(F.col("o_totalprice") / 100_000.0, 2.0), 6).alias("sq_norm"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("mod7"),
    )


@register(
    "array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(embedding[1]::DOUBLE, 6) AS first_val,
           round(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
                             (a, b) -> a + b), 6) AS sq_norm,
           len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_positive,
           round(list_reduce(embedding::DOUBLE[],
                             (a, b) -> CASE WHEN b > a THEN b ELSE a END), 6)
               AS max_val
    FROM embeddings
    """,
    tags=("scalar",),
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/transform/filter/aggregate over array<float> — the
    higher-order-function kernel behind similarity search (§2.11) and the
    nested ``depths`` queries of the WOD cast model (SURVEY §1.2).
    All lambdas are Catalyst expressions (JVM), not Python UDFs."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
            ),
            6,
        ).alias("sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                emb,
                F.lit(float("-inf")),
                lambda a, b: F.when(b > a, b).otherwise(a),
            ),
            6,
        ).alias("max_val"),
    )


@register(
    "array_explode",
    """
    SELECT vec_id, CAST(pos - 1 AS INT) AS pos, round(val::DOUBLE, 6) AS val
    FROM (
        SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
               unnest(embedding) AS val
        FROM embeddings
        WHERE vec_id < 32
    )
    """,
    tags=("scalar",),
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → rows with position. The unnesting primitive for
    the WOD ``depths`` array-of-struct queries."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 32)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("col"), 6).alias("val"),
    )


@register(
    "map_funcs",
    """
    SELECT o_orderkey,
           o_orderstatus AS status_from_map,
           round(o_totalprice, 2) AS price_from_map,
           2 AS n_keys
    FROM orders
    """,
    tags=("scalar",),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map/map_keys/element_at round-trip. The oracle states the
    expected *result* (map construction then extraction is identity);
    the Spark side genuinely routes values through a MapType column."""
    o = load(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("price"), F.col("o_totalprice").cast("string"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_from_map"),
        F.round(F.element_at(m, "price").cast("double"), 2).alias("price_from_map"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
    tags=("scalar",),
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over ``events.props`` (``{"k": <int>}`` strings):
    ``get_json_object`` path access + schema-full ``from_json``."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.when(parsed.isNotNull(), 1).otherwise(0).alias("is_valid"),
    )


@register(
    "map_funcs2",
    """
    SELECT l_orderkey, l_linenumber, key, round(val, 2) AS value FROM (
        SELECT l_orderkey, l_linenumber, u.key AS key, u.val AS val
        FROM lineitem, UNNEST([
            {'key': 'price', 'val': l_extendedprice + 0.0},
            {'key': 'qty',   'val': l_quantity + l_quantity * 2},
            {'key': 'tax',   'val': 0.0 + l_tax}
        ]) AS t(u)
    ) WHERE val > 5
    """,
    tags=("scalar",),
)
def map_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map HIGHER-ORDER functions — the surface ``map_funcs`` (create/
    keys/element_at) doesn't reach: ``map_zip_with`` merges two maps with
    per-key logic (missing keys coalesce to 0), ``map_filter`` prunes
    entries by value, ``transform_values`` rewrites in place; the result
    explodes to (key, value) rows. The oracle has no map-lambda surface,
    so it enumerates the same three key slots as struct literals and
    applies the identical filter/round chain — same values, engine-
    neutral shape. All JVM-side Catalyst lambdas, map-only."""
    li = load(spark, sf_dir, "lineitem")
    m1 = F.create_map(
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("qty"), F.col("l_quantity"),
    )
    m2 = F.create_map(
        F.lit("qty"), F.col("l_quantity") * 2,
        F.lit("tax"), F.col("l_tax"),
    )
    zipped = F.map_zip_with(
        m1,
        m2,
        lambda k, a, b: F.coalesce(a, F.lit(0.0)) + F.coalesce(b, F.lit(0.0)),
    )
    filtered = F.map_filter(zipped, lambda k, v: v > 5.0)
    rounded = F.transform_values(filtered, lambda k, v: F.round(v, 2))
    return li.select(
        "l_orderkey", "l_linenumber", F.explode(rounded).alias("key", "value")
    )


@register(
    "variant_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
           CAST(NULL AS INT) AS missing_val,
           'OBJECT<k: BIGINT>' AS vschema
    FROM events
    """,
    tags=("scalar",),
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the open-format semi-structured type that
    replaces string-JSON hot paths (binary-encoded, ~8× faster repeated
    path access than get_json_object re-parsing): ``parse_json`` ingests,
    ``variant_get`` extracts typed paths, ``try_variant_get`` yields null
    on absent paths instead of erroring, ``schema_of_variant`` reports
    the inferred shape. The oracle reads the same answers off DuckDB's
    JSON functions (the inferred schema is a constant on this fixture —
    every props row is ``{"k": <int>}``)."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_value"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
        F.schema_of_variant(v).alias("vschema"),
    )
