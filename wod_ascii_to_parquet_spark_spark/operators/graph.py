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

Scale notes (100 TB): the static graph is hash-partitioned by ``src`` once
and cached (``repartition("src").persist()`` — the cache scan advertises
the partitioning, so EnsureRequirements inserts no edge-side Exchange);
each iteration is then one shuffle (the ``groupBy(dst)`` of contributions)
plus a rank-vector-sized exchange. Degree rides the same ``src``
partitioning as the edge list. For deep iteration counts,
``localCheckpoint`` on the RANK vector every ~5 rounds truncates lineage
exactly as ``dedup_cluster_assign`` does; 3 rounds doesn't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import load, register

#: fixed-point scale: rank mass totals ~1e12 across the graph; teleport is
#: (1-d)·scale for d=0.85. Interpolated into the SQL oracle below so both
#: engines share ONE definition.
_SCALE = 1_000_000_000_000.0
_TELEPORT = 150_000_000_000.0  # 0.15 · scale
_DAMP = 0.85

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
               CAST(floor({t} / n) AS BIGINT)
               + CAST(floor({d} * COALESCE(m, 0)) AS BIGINT) AS r
        FROM nodes CROSS JOIN n
        LEFT JOIN s{k} ON nodes.id = s{k}.id
    )"""

_PR_ORACLE = (
    """
    WITH pairs AS (
        SELECT DISTINCT 2 * l_suppkey AS s, 2 * o_custkey + 1 AS c
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
        SELECT id, CAST(floor({s} / n) AS BIGINT) AS r
        FROM nodes CROSS JOIN n
    ),""".format(s=_SCALE)
    + ",".join(
        _PR_ITER_SQL.format(k=k, p=k - 1, t=_TELEPORT, d=_DAMP)
        for k in (1, 2, 3)
    )
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
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Degree rides the edge list (joined once, outside the loop), so each
    # iteration is exactly one join + one aggregate. This is the ONE
    # materialization: the static graph is checkpointed so iterations
    # don't re-run the lineitem⋈orders distinct (same discipline as
    # dedup_cluster_assign); keeping it to a single compact all-BIGINT
    # dataset bounds driver/storage memory across repeated invocations.
    # Cached ALREADY hash-partitioned on ``src``: InMemoryRelation
    # advertises its child's outputPartitioning, so the per-iteration
    # rank join needs no Exchange on the edge side — only the
    # |nodes|-sized rank vector moves, and the single full-width shuffle
    # per iteration is the contribution ``groupBy(dst)``. The cache is
    # SESSION-SCOPED by design: the returned DataFrame references it
    # lazily, so it cannot be unpersisted here; CacheManager matches by
    # logical plan, so a repeat invocation reuses (and re-populates after
    # clearCache) the same entry rather than accumulating. Measured
    # harnesses call spark.catalog.clearCache() between runs (bench.py)
    # so steady-state timings exercise the full pipeline. (localCheckpoint
    # would truncate lineage too, but its LogicalRDD reports unknown
    # partitioning under AQE, reintroducing a full edge-list shuffle per
    # iteration — measured, not guessed.) Without this, every iteration
    # re-shuffles the entire edge list: at 100 TB that is the difference
    # between moving the graph k times and moving it once. MEMORY_AND_DISK
    # default storage spills gracefully when the graph outgrows memory.
    ew = edges.join(deg, "src").repartition("src").persist()
    # NOT persisted (r16, measured and rejected): caching this distinct
    # frame too would dedupe it across the count action and the
    # ranks-init subtree, but the measured win was marginal (−8% JVM CPU
    # min, pairwise only 3/4 — tools/exp_pagerank_nodes_from_deg.py) and
    # a SECOND InMemoryRelation breaks the executed-plan inspection the
    # edge-partitioning pin relies on (test_plans.py): AQE prints the
    # extra cache's own build plan with de-dented "Final Plan" sections
    # that read as live exchanges. Not worth it for noise-scale CPU.
    nodes = ew.select(F.col("src").alias("id")).distinct()
    # N is a single scalar — one driver action on the checkpointed graph
    # (same budget as dedup_cluster_assign's convergence probe). floor of
    # a double division, matching the oracle's floor(1e12 / n) exactly.
    import math

    n_val = nodes.count()
    base = math.floor(_SCALE / n_val)
    teleport = math.floor(_TELEPORT / n_val)

    ranks = nodes.select("id", F.lit(base).cast("bigint").alias("r"))
    for _ in range(3):
        # Symmetric edges ⇒ every node occurs as a dst, so the aggregate
        # covers all nodes and the oracle's LEFT JOIN/COALESCE reattach is
        # a no-op here — contributions ARE the next rank vector.
        contrib = (
            ew.join(ranks, F.col("src") == F.col("id"))
            .groupBy("dst")
            .agg(
                F.sum(
                    F.floor(F.col("r").cast("double") / F.col("outdeg"))
                ).alias("m")
            )
        )
        ranks = contrib.select(
            F.col("dst").alias("id"),
            (
                F.lit(teleport) + F.floor(F.lit(_DAMP) * F.col("m"))
            ).cast("bigint").alias("r"),
        )
    return (
        ranks.select("id", F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "id")
        .limit(50)
    )


@register(
    "graph_triangle_count",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY u, v
        HAVING count(*) >= 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v
    """,
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-purchase graph (parts co-occurring in
    ≥2 orders): the canonical distributed-graph benchmark. Edges are
    oriented u < v, so each triangle u<v<w is counted exactly once by the
    wedge-close join e(u,v) ⋈ e(v,w) ⋈ e(u,w) — two hash joins on node
    keys, no node ever sees more than its neighborhood. At scale, orient
    edges by DEGREE (low→high) instead of id to bound the wedge count by
    O(E^1.5) on skewed graphs (standard Cohen's trick; id-orientation is
    fine at the test graph's density)."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = items.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("v")
    )
    edges = (
        a.join(b, (F.col("l_orderkey") == F.col("o2")) & (F.col("u") < F.col("v")))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    e1 = edges
    e2 = edges.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
    e3 = edges.select(F.col("u").alias("u3"), F.col("v").alias("v3"))
    return (
        e1.join(e2, F.col("v") == F.col("u2"))
        .join(
            e3,
            (F.col("u") == F.col("u3")) & (F.col("v2") == F.col("v3")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
