"""Graph analytics over relationship edges derived from the fact tables.

``dedup_cluster_assign`` (dedup.py) already covers connected components;
this module adds PageRank — the other iterative graph primitive a
corpus-curation pipeline reaches for (authority-weight documents by
citation/link graphs, rank entities by co-occurrence).

Determinism discipline: ranks are FIXED-POINT BIGINTs (1e12 scale). Every
per-iteration operation — integer share ``floor(r / outdeg)``, damping
``floor(0.85 · Σ)`` — is exact in both engines (all intermediates < 2^53,
so the double round-trip is lossless), which lets a 3-iteration run be
verified bit-for-bit against a fully unrolled SQL oracle. Float PageRank
would drift by summation order and could never be hash-checked.

Scale notes (100 TB): edges are hash-partitioned by ``src`` once; each
iteration is one shuffle (the ``groupBy(dst)`` of contributions) — rank and
degree ride the same ``src`` partitioning as the edge list. For deep
iteration counts, ``localCheckpoint`` every ~5 rounds truncates lineage
exactly as ``dedup_cluster_assign`` does; 3 rounds doesn't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register

#: fixed-point scale: rank mass totals ~1e12 across the graph.
_SCALE = 1_000_000_000_000.0
_TELEPORT = 150_000_000_000.0  # 0.15 · scale

_PR_ITER_SQL = """
    s{k} AS (
        SELECT e.dst AS id,
               sum(CAST(floor(CAST(r.r AS DOUBLE) / d.outdeg) AS BIGINT)) AS m
        FROM edges e
        JOIN r{p} r ON e.src = r.id
        JOIN deg d  ON e.src = d.src
        GROUP BY e.dst
    ),
    r{k} AS (
        SELECT nodes.id,
               CAST(floor(150000000000.0 / n) AS BIGINT)
               + CAST(floor(0.85 * COALESCE(m, 0)) AS BIGINT) AS r
        FROM nodes CROSS JOIN n
        LEFT JOIN s{k} ON nodes.id = s{k}.id
    )"""

_PR_ORACLE = (
    """
    WITH pairs AS (
        SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS s,
                        'C' || CAST(o_custkey AS VARCHAR) AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT s AS src, c AS dst FROM pairs
        UNION ALL
        SELECT c AS src, s AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg   AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    n     AS (SELECT count(*) AS n FROM nodes),
    r0    AS (
        SELECT id, CAST(floor(1000000000000.0 / n) AS BIGINT) AS r
        FROM nodes CROSS JOIN n
    ),"""
    + ",".join(_PR_ITER_SQL.format(k=k, p=k - 1) for k in (1, 2, 3))
    + """
    SELECT id, r AS rank_fp FROM r3
    ORDER BY rank_fp DESC, id
    LIMIT 50
    """
)


@register("graph_pagerank", _PR_ORACLE, tags=("graph", "iterative"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) over the supplier↔customer shipment
    graph: an undirected edge per observed (supplier, customer) pair, so
    the stationary weight measures trading centrality. Iterations run as a
    driver loop over DataFrame ops — each round is contribution-join →
    dst-aggregate → node re-attach, the standard Pregel-as-joins encoding.
    """
    pairs = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.agg(F.count(F.lit(1)).alias("n"))

    ranks = nodes.join(F.broadcast(n)).select(
        "id", F.floor(F.lit(_SCALE) / F.col("n")).alias("r")
    )
    for _ in range(3):
        contrib = (
            edges.join(ranks, F.col("src") == F.col("id"))
            .join(deg, "src")
            .groupBy("dst")
            .agg(
                F.sum(
                    F.floor(F.col("r").cast("double") / F.col("outdeg"))
                ).alias("m")
            )
        )
        ranks = (
            nodes.join(F.broadcast(n))
            .join(contrib, F.col("id") == F.col("dst"), "left")
            .select(
                "id",
                (
                    F.floor(F.lit(_TELEPORT) / F.col("n"))
                    + F.floor(F.lit(0.85) * F.coalesce(F.col("m"), F.lit(0)))
                ).alias("r"),
            )
        )
    return (
        ranks.select("id", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "id")
        .limit(50)
    )
