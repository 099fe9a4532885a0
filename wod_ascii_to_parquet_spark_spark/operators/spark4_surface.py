"""Spark 4 native surface: VARIANT semi-structured access, collated
strings, XML parsing, and mergeable HLL sketches.

These are the engine capabilities Spark 4 added over 3.x that a user
migrating a semi-structured / multilingual / cardinality-heavy workload
expects to find (SURVEY §4.2 scope — stock Catalyst, zero custom rules):

- ``VARIANT`` (``parse_json`` + ``variant_get``): the open-type column for
  JSON whose shape isn't known at write time — unlike ``from_json`` there
  is no schema to declare, and unlike ``get_json_object`` access is a
  binary-encoded tree walk, not a per-call string re-parse. At 100 TB the
  parse happens ONCE at ingest; every downstream query does typed O(path)
  extraction.
- Collations (``collate``): case-insensitive grouping/equality inside the
  engine — the alternative users reach for (``lower()`` everywhere)
  allocates a rewritten copy of every string per query.
- XML (``from_xml`` / ``xpath_*``): the remaining wire format the scan
  surface didn't cover (csv/json/parquet/orc/avro-shape all tested in
  tests/test_sources_roundtrip.py).
- HLL sketches (``hll_sketch_agg`` / ``hll_union_agg``): PARTIAL
  cardinality state that merges across partitions, days, and reruns — the
  two-phase pattern every 100 TB distinct-count deployment uses (store
  per-shard sketches, union at read). ``approx_count_distinct`` answers
  one query; a stored sketch answers every future rollup of it.

Oracle discipline: DuckDB has no VARIANT/collation/XML, so each oracle
mirrors semantics it CAN express — the VARIANT oracle runs DuckDB's JSON
tree-walk over the identical JSON text, the collation oracle groups by
``lower()``, the XML oracle exploits that the XML is built from table
columns (round-trip identity: parse(build(x)) = x), and the HLL entry is
rows-only (engine-specific sketch; tolerance vs exact asserted in
tests/test_spark4_surface.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register, spread

#: schema_of_variant over _VARIANT_JSON's shape — constant across rows, so
#: the oracle can select it as a literal (pinned here, asserted per-row by
#: the hash check).
_VARIANT_SCHEMA = (
    "OBJECT<arr: ARRAY<BIGINT>, id: BIGINT, maybe: VOID, "
    "pri: STRING, st: STRING>"
)


@register(
    "json_variant_extract",
    f"""
    WITH j AS (
        SELECT o_orderkey,
               '{{"id":' || o_orderkey || ',"st":"' || o_orderstatus ||
               '","pri":"' || o_orderpriority || '","arr":[' || o_custkey ||
               ',' || o_orderkey || '],"maybe":null}}' AS js
        FROM orders
    )
    SELECT o_orderkey,
           CAST(json_extract(js, '$.id') AS BIGINT) AS vid,
           json_extract_string(js, '$.pri') AS vpri,
           CAST(json_extract(js, '$.arr[1]') AS BIGINT) AS varr1,
           CASE WHEN json_type(js, '$.maybe') = 'NULL' THEN 1 ELSE 0 END
               AS maybe_is_null,
           CASE WHEN try_cast(json_extract_string(js, '$.st') AS BIGINT)
                     IS NULL THEN 1 ELSE 0 END AS bad_cast_null,
           '{_VARIANT_SCHEMA}' AS vschema
    FROM j
    """,
    tags=("scalar", "spark4"),
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingest-then-extract: build a nested JSON document per order
    (object, string/int leaves, array, JSON null), ``parse_json`` it ONCE
    into a VARIANT, then answer everything with typed ``variant_get`` path
    walks — including the two edge semantics that distinguish VARIANT from
    stringly JSON: a JSON ``null`` is a present-but-null VALUE
    (``is_variant_null``, not SQL NULL), and a failed typed extraction
    under ``try_variant_get`` yields SQL NULL instead of erroring.
    ``schema_of_variant`` recovers the per-row inferred shape (constant
    here — pinned in the oracle as a literal). The DuckDB oracle runs its
    own JSON tree-walk over the identical document text."""
    o = load(spark, sf_dir, "orders")
    js = F.concat(
        F.lit('{"id":'),
        F.col("o_orderkey").cast("string"),
        F.lit(',"st":"'),
        F.col("o_orderstatus"),
        F.lit('","pri":"'),
        F.col("o_orderpriority"),
        F.lit('","arr":['),
        F.col("o_custkey").cast("string"),
        F.lit(","),
        F.col("o_orderkey").cast("string"),
        F.lit('],"maybe":null}'),
    )
    # Shuffle barrier (the minhash/simhash discipline): six downstream
    # consumers reference ``v``, and project collapsing would inline — i.e.
    # re-run — the parse_json at every reference (measured 6× the parse
    # cost; the conditional consumers sit in CASE branches, so codegen
    # subexpression elimination cannot rescue them). The Exchange
    # materializes the parsed VARIANT once, which is the documented
    # semantics — and the right trade at scale: variant binary is about
    # json-sized, so one shuffle of it is far cheaper than five re-parses.
    v = o.select("o_orderkey", F.parse_json(js).alias("v")).repartition(
        F.col("o_orderkey")
    )
    return v.select(
        "o_orderkey",
        F.variant_get("v", "$.id", "bigint").alias("vid"),
        F.variant_get("v", "$.pri", "string").alias("vpri"),
        F.variant_get("v", "$.arr[1]", "bigint").alias("varr1"),
        F.when(
            F.is_variant_null(F.variant_get("v", "$.maybe", "variant")), 1
        )
        .otherwise(0)
        .alias("maybe_is_null"),
        F.when(F.try_variant_get("v", "$.st", "bigint").isNull(), 1)
        .otherwise(0)
        .alias("bad_cast_null"),
        F.schema_of_variant("v").alias("vschema"),
    )


@register(
    "string_collation_ci",
    """
    WITH m AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                    ELSE lower(p_type) END AS mixed,
               p_retailprice
        FROM part
    )
    SELECT lower(mixed) AS type_ci,
           count(*) AS n_parts,
           count(DISTINCT mixed) AS n_case_variants,
           CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
               AS retail_c100
    FROM m GROUP BY lower(mixed)
    """,
    tags=("scalar", "spark4"),
)
def string_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a real COLLATION (``UTF8_LCASE``), not
    a ``lower()`` rewrite: the mixed-case column (case alternated by part
    key parity, so every ci-group genuinely has 2 case variants) is grouped
    on ``collate(mixed, 'UTF8_LCASE')`` — comparison happens under the
    collation, the bytes are untouched. ``count(DISTINCT mixed)`` inside
    the same aggregate counts under the DEFAULT binary collation, showing
    the two coexist per-expression. Output key is lowercased only for a
    deterministic representative (a collated group's witness row is
    otherwise unspecified). At 100 TB the win is the absent rewrite: no
    second copy of every string materialized per query. Oracle: the
    ``lower()`` rewrite itself — identical groups by construction."""
    m = load(spark, sf_dir, "part").select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_type"))
        )
        .otherwise(F.lower(F.col("p_type")))
        .alias("mixed"),
        "p_retailprice",
    )
    return (
        m.groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_distinct(F.col("mixed")).alias("n_case_variants"),
            F.sum(
                F.round(F.col("p_retailprice") * 100, 0).cast("bigint")
            ).alias("retail_c100"),
        )
        .select(
            F.lower(F.col("k")).alias("type_ci"),
            "n_parts",
            "n_case_variants",
            "retail_c100",
        )
    )


@register(
    "xml_funcs",
    """
    SELECT o_orderkey,
           o_orderstatus AS st,
           o_orderpriority AS pri,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c100,
           o_orderpriority AS pri_struct
    FROM orders
    """,
    tags=("scalar", "spark4"),
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML parse surface: each order is rendered as an XML document, then
    every output value is recovered by PARSING it back — ``xpath_string``
    / ``xpath_long`` for path extraction and ``from_xml`` for schema-full
    struct parsing (both Spark 4 surfaces; the XPath family evaluates per
    path, ``from_xml`` parses once). The oracle exploits round-trip
    identity — the XML is built from table columns, so parse(build(x))
    must equal x exactly; DuckDB (no XML support) just selects the source
    columns. Values are alnum/hyphen so no XML escaping is involved
    (escaping paths are the scan-format tests' concern)."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    xml = F.concat(
        F.lit("<o><st>"),
        F.col("o_orderstatus"),
        F.lit("</st><pri>"),
        F.col("o_orderpriority"),
        F.lit("</pri><c>"),
        cents.cast("string"),
        F.lit("</c></o>"),
    )
    # spread() below the scan (round 15): the per-row work here is 4 XML
    # parses (3 XPath DOM parses + from_xml), and orders at bench SF is a
    # single ~2.6 MB input split — one scan task serialized the whole
    # parse onto one core. Round-robin to defaultParallelism shuffles
    # only (key, ~60 B xml) rows; measured 20.1 s → 1.9 s steady
    # (tools/exp_xml_spread.py, interleaved, results asserted identical).
    x = spread(o.select("o_orderkey", xml.alias("xml")))
    parsed = F.from_xml(F.col("xml"), "st STRING, pri STRING, c BIGINT")
    return x.select(
        "o_orderkey",
        F.xpath_string(F.col("xml"), F.lit("/o/st")).alias("st"),
        F.xpath_string(F.col("xml"), F.lit("/o/pri")).alias("pri"),
        F.expr("xpath_long(xml, '/o/c')").alias("price_c100"),
        parsed["pri"].alias("pri_struct"),
    )


@register("agg_hll_mergeable", None, tags=("agg", "sketch", "spark4", "rows-only"))
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE cardinality sketches — the two-phase distinct-count
    pattern a 100 TB deployment stores: phase 1 folds each group's keys
    into an HLL sketch (``hll_sketch_agg``, a few KB regardless of input
    size); phase 2 answers BOTH the per-group estimates and the overall
    rollup from the same sketches — the 'ALL' row is ``hll_union_agg``
    over the three per-status sketches, never a second scan of the data.
    This is what ``approx_count_distinct`` cannot do: its state dies with
    the query, so every new rollup re-reads the corpus; stored sketches
    make distinct-count rollups O(groups), and the same union works across
    days/shards/reruns. Rows-only (the sketch registers are
    engine-specific); tests/test_spark4_surface.py asserts every estimate
    within 5% of the exact distinct count."""
    o = load(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    per_group = sk.select(
        "o_orderstatus",
        F.hll_sketch_estimate("sk").alias("approx_customers"),
    )
    overall = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
            "approx_customers"
        )
    ).select(F.lit("ALL").alias("o_orderstatus"), "approx_customers")
    return per_group.unionAll(overall)


@register(
    "sql_recursive_cte",
    """
    WITH RECURSIVE chain(start_key, cur_key, depth) AS (
        SELECT o_orderkey, o_orderkey, 0 FROM orders
            WHERE o_orderkey >= 1 AND o_orderkey < 10
        UNION ALL
        SELECT c.start_key, o.o_orderkey, c.depth + 1
        FROM chain c JOIN orders o ON o.o_orderkey = c.cur_key * 2
    )
    SELECT start_key, CAST(max(depth) AS BIGINT) AS max_depth,
           max(cur_key) AS last_key
    FROM chain GROUP BY start_key
    """,
    tags=("sql", "spark4"),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4.1's `WITH RECURSIVE`) with DATA-DEPENDENT
    depth: starting from the orderkeys below 10, each step rejoins the
    frontier against the orders table at twice the current key, so the
    recursion walks the doubling chains actually present in the data and
    terminates when a chain's next key is absent — per-start depths
    differ, which is exactly what a fixed self-join stack can't express.
    This is the hierarchy/reachability surface (org charts, BOM
    explosions, graph closure) in its engine-native form; the iterative
    DataFrame loops (`graph_pagerank`, `dedup_cluster_assign`) remain the
    scale path when the frontier itself is 100 TB-sized, since each
    recursive step here is a full plan segment under one query. DuckDB
    runs the identical statement (both engines implement the SQL:1999
    recursion semantics), making this fully hash-checked."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_rcte")
    return spark.sql(
        """
        WITH RECURSIVE chain(start_key, cur_key, depth) AS (
            SELECT o_orderkey, o_orderkey, 0 FROM __orders_rcte
            WHERE o_orderkey >= 1 AND o_orderkey < 10
            UNION ALL
            SELECT c.start_key, o.o_orderkey, c.depth + 1
            FROM chain c JOIN __orders_rcte o ON o.o_orderkey = c.cur_key * 2
        )
        SELECT start_key, CAST(max(depth) AS BIGINT) AS max_depth,
               max(cur_key) AS last_key
        FROM chain GROUP BY start_key
        """
    )


@register(
    "sql_scripting_threshold",
    """
    WITH k AS (
        SELECT n FROM (SELECT unnest(generate_series(0, 62)) AS n)
        WHERE (SELECT count(*) FROM orders
               WHERE o_totalprice > 1000.0 * power(2, n)) < 100
        ORDER BY n LIMIT 1
    )
    SELECT CAST(1000.0 * power(2, k.n) AS DOUBLE) AS threshold,
           (SELECT count(*) FROM orders
            WHERE o_totalprice > 1000.0 * power(2, k.n)) AS n_above
    FROM k
    """,
    tags=("sql", "spark4"),
)
def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4's `BEGIN ... END` procedural blocks):
    DECLARE'd variables and a WHILE loop that keeps doubling a price
    threshold until fewer than 100 orders exceed it — a data-dependent
    fixpoint driven entirely inside the SQL layer, the shape ops
    runbooks and migration scripts use (no Python driver loop, no
    round-trips: the script is one statement to the engine). The last
    statement's result is the script's result. DuckDB has no scripting,
    so the oracle computes the same fixpoint declaratively: the minimal
    doubling count whose survivor set is below the limit."""
    # The conf gates the PARSER, so it only needs to be live for the
    # spark.sql call itself — restore it after (no ambient session state;
    # the procedural statements execute within the call, and the returned
    # DataFrame of the final SELECT plans/executes like any other).
    try:
        saved = spark.conf.get("spark.sql.scripting.enabled")
    except Exception:
        saved = None
    spark.conf.set("spark.sql.scripting.enabled", "true")
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_script")
    try:
        return spark.sql(
            """
            BEGIN
                DECLARE thr DOUBLE DEFAULT 1000.0;
                DECLARE n_above BIGINT DEFAULT 0;
                SET n_above = (SELECT count(*) FROM __orders_script
                               WHERE o_totalprice > thr);
                WHILE n_above >= 100 DO
                    SET thr = thr * 2;
                    SET n_above = (SELECT count(*) FROM __orders_script
                                   WHERE o_totalprice > thr);
                END WHILE;
                SELECT thr AS threshold, n_above AS n_above;
            END
            """
        )
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", saved)


@register(
    "sql_star_shortcuts",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_c100
    FROM (
        SELECT * EXCLUDE (o_orderdate, o_custkey)
        FROM orders WHERE o_totalprice > 150000.0
    )
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "spark4"),
)
def sql_star_shortcuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL ergonomics, cross-engine checked: ``SELECT * EXCEPT``
    (Spark) / ``EXCLUDE`` (DuckDB) projects away columns by exclusion,
    ``GROUP BY ALL`` groups by every non-aggregate select item, and
    ``ORDER BY ALL`` orders by the whole select list — the shorthand
    surface analysts actually type. The threshold arrives as a NAMED
    PARAMETER (``spark.sql(..., args=...)``) rather than string
    interpolation — the injection-safe form of templated SQL (the oracle
    inlines the same literal). All sugar: the plan is the same
    scan→filter→aggregate Catalyst would build from the explicit
    spelling."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("__orders_star")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_c100
        FROM (
            SELECT * EXCEPT (o_orderdate, o_custkey)
            FROM __orders_star WHERE o_totalprice > :minp
        )
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"minp": 150000.0},
    )
