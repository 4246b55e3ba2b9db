"""Graph-analytics gate: integer-quantized PageRank over the part
co-purchase graph (operators/graph.py).

The oracle RE-RUNS all five power iterations in SQL (materialized CTE
levels, like the BPE re-training oracle) — edge build, degrees, integer
contributions, damping — so a join-direction, degree, flooring, or
iteration-count bug flips the hash, not just "ranks look plausible".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import graph as G
from payroll_etl_fastapi_spark.plans.suite import _t, query

_PR_ITERS = 5
_PR_TOPK = 20


def _pagerank_oracle(iters: int = _PR_ITERS, topk: int = _PR_TOPK) -> str:
    base = G.PR_SCALE * (100 - G.PR_DAMPING_PCT) // 100
    parts = [
        "WITH li AS MATERIALIZED ("
        " SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),",
        "pr AS MATERIALIZED ("
        " SELECT a.p AS u, b.p AS v FROM li a JOIN li b"
        " ON a.o = b.o AND a.p < b.p),",
        "edges AS MATERIALIZED ("
        " SELECT DISTINCT src, dst FROM ("
        "  SELECT u AS src, v AS dst FROM pr"
        "  UNION ALL SELECT v, u FROM pr)),",
        "deg AS MATERIALIZED ("
        " SELECT src, count(*) AS d FROM edges GROUP BY src),",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),",
        f"r0 AS MATERIALIZED ("
        f" SELECT node, CAST({G.PR_SCALE} AS BIGINT) AS r FROM nodes),",
    ]
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        parts.append(
            f"c{k} AS MATERIALIZED ("
            f" SELECT e.dst AS node, sum({prev}.r // deg.d) AS s"
            f" FROM edges e"
            f" JOIN {prev} ON e.src = {prev}.node"
            f" JOIN deg ON e.src = deg.src"
            f" GROUP BY e.dst),"
        )
        parts.append(
            f"r{k} AS MATERIALIZED ("
            f" SELECT n.node, CAST({base} + {G.PR_DAMPING_PCT} *"
            f" coalesce(c{k}.s, 0) // 100 AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN c{k} ON n.node = c{k}.node),"
        )
    parts.append(
        f"fin AS (SELECT node AS partkey, r AS rank_micro FROM r{iters})"
        f" SELECT partkey, rank_micro FROM fin"
        f" ORDER BY rank_micro DESC, partkey LIMIT {topk}"
    )
    return "\n".join(parts)


@query("graph_pagerank_parts", oracle=_pagerank_oracle())
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by integer PageRank over the co-purchase graph
    (operators.graph.pagerank): parts sharing an order are linked; five
    integer power iterations rank basket centrality. The division-free
    quantization (rank DIV degree, (85·s) DIV 100) makes every iteration
    aggregation-order-proof, so the oracle replays all five iterations
    bit-for-bit.

    Scale shape (100 TB): edge build is an equality join on the order key
    (per-order fan-out bounded by basket size); each iteration is one
    src-keyed equality join + one map-side-combined grouped sum + one left
    join to the node set — a cluster reuses the src-hash exchange across
    iterations; degrees/nodes are lazily localCheckpoint'd so the edge
    scan runs once. Top-20 is TakeOrderedAndProject. Complements
    dedup_connected_components as the second iterative-join graph
    primitive. NEW in round 4 (post-tail); round-5 rotation candidate."""
    li = _t(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    # parts are a dimension-sized node set: broadcast the rank frame so
    # the edge table is never shuffled per iteration (see pagerank docs);
    # copurchase edges are symmetric by construction, so the symmetric
    # fast path (round 12) skips the src∪dst node build and the per-round
    # nodes left-join — identical ranks, one exchange less per round
    ranks = G.pagerank(
        edges, iterations=_PR_ITERS, broadcast_ranks=True, symmetric_input=True
    )
    return (
        ranks.select(F.col("node").alias("partkey"), "rank_micro")
        .orderBy(F.desc("rank_micro"), "partkey")
        .limit(_PR_TOPK)
    )


@query(
    "assoc_rules_parts",
    oracle="""
    WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT count(DISTINCT o) AS n FROM li),
    ic AS MATERIALIZED (SELECT p, count(*) AS c FROM li GROUP BY p),
    pc AS MATERIALIZED (
        SELECT a.p AS u, b.p AS v, count(*) AS c_ab
        FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    d AS (
        SELECT u, v, c_ab FROM pc
        UNION ALL SELECT v, u, c_ab FROM pc
    )
    SELECT d.u AS antecedent, d.v AS consequent,
           CAST(d.c_ab AS BIGINT) AS c_ab,
           CAST(ia.c AS BIGINT)   AS c_a,
           CAST(ib.c AS BIGINT)   AS c_b,
           CAST(d.c_ab * 10000 // n.n AS BIGINT)  AS support_bp,
           CAST(d.c_ab * 10000 // ia.c AS BIGINT) AS confidence_bp,
           CAST(d.c_ab * n.n * 1000000 // (ia.c * ib.c) AS BIGINT) AS lift_micro
    FROM d JOIN ic ia ON d.u = ia.p JOIN ic ib ON d.v = ib.p, n
    ORDER BY lift_micro DESC, antecedent, consequent LIMIT 20
    """,
)
def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (operators.assoc.
    pair_association_rules): the 20 directed part-pair rules with the
    highest lift over order baskets, with exact supports and integer
    basis-point/microunit metrics — support, confidence, lift all via DIV,
    so the oracle replays counts, metrics, and ranking exactly.

    Scale shape (100 TB): pair counts from one basket-keyed equality
    self-join (fan-out bounded by basket size) + one map-side-combined
    count; item counts attach via two equality joins (no amplification);
    the basket total is a 1-row broadcast; ranking is
    TakeOrderedAndProject. The pairwise core of Apriori — higher-order
    itemsets deliberately out of scope (combinatorial for marginal value).
    NEW in round 4 (post-tail); round-5 rotation candidate."""
    from payroll_etl_fastapi_spark.operators import assoc as A

    li = _t(spark, sf_dir, "lineitem")
    return A.pair_association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2, top_k=20
    )


_LP_ITERS = 4
_LP_TOPK = 20


def _label_prop_oracle(iters: int = _LP_ITERS, topk: int = _LP_TOPK) -> str:
    parts = [
        "WITH li AS MATERIALIZED ("
        " SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),",
        "pr AS MATERIALIZED ("
        " SELECT a.p AS u, b.p AS v FROM li a JOIN li b"
        " ON a.o = b.o AND a.p < b.p),",
        "edges AS MATERIALIZED ("
        " SELECT DISTINCT src, dst FROM ("
        "  SELECT u AS src, v AS dst FROM pr"
        "  UNION ALL SELECT v, u FROM pr)),",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),",
    ]
    for k in range(1, iters + 1):
        prev = f"l{k - 1}"
        parts.append(
            f"n{k} AS MATERIALIZED ("
            f" SELECT e.dst AS v, l.label, count(*) AS c"
            f" FROM edges e JOIN {prev} l ON e.src = l.node"
            f" GROUP BY 1, 2),"
        )
        parts.append(
            f"l{k} AS MATERIALIZED ("
            f" SELECT v AS node, label FROM ("
            f"  SELECT v, label,"
            f"   row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn"
            f"  FROM n{k}) WHERE rn = 1),"
        )
    parts.append(
        f"fin AS (SELECT label AS community, count(*) AS n_members"
        f" FROM l{iters} GROUP BY 1)"
        f" SELECT community, CAST(n_members AS BIGINT) AS n_members"
        f" FROM fin ORDER BY n_members DESC, community LIMIT {topk}"
    )
    return "\n".join(parts)


@query("graph_label_propagation", oracle=_label_prop_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by deterministic synchronous label propagation
    (operators.graph.label_propagation; Raghavan et al. 2007 with
    smallest-label tie-breaks): the 20 largest co-purchase communities
    after four rounds. Deterministic ties + synchronous updates make the
    communities a pure function of the graph, so the oracle re-runs ALL
    four rounds in materialized SQL CTEs — a join-direction, counting, or
    tie-break bug flips the hash. Per round: one src-keyed join (labels
    broadcast — dimension graph), one map-side-combined count, one
    node-partitioned argmax window (state ≤ degree). NEW in round 4
    (post-tail); round-5 rotation candidate."""
    li = _t(spark, sf_dir, "lineitem")
    edges = G.copurchase_edges(li)
    labels = G.label_propagation(
        edges, iterations=_LP_ITERS, broadcast_labels=True, symmetric_input=True
    )
    return (
        labels.groupBy(F.col("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(_LP_TOPK)
    )


@query(
    "graph_triangle_counts",
    oracle="""
    WITH li AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        WHERE l_orderkey % 7 = 0
    ),
    pr AS MATERIALIZED (
        SELECT a.p AS u, b.p AS v FROM li a JOIN li b
        ON a.o = b.o AND a.p < b.p
    ),
    e AS MATERIALIZED (SELECT DISTINCT u AS a, v AS b FROM pr),
    deg AS MATERIALIZED (
        SELECT node, count(*) AS degree FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
        ) GROUP BY node
    ),
    tri AS MATERIALIZED (
        SELECT ab.a, ab.b, bc.b AS c
        FROM e ab JOIN e bc ON ab.b = bc.a
        JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    per AS (
        SELECT node, count(*) AS n_triangles FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT d.node,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(p.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.degree < 2 THEN 0
                ELSE 2 * coalesce(p.n_triangles, 0) * 10000
                     // (d.degree * (d.degree - 1)) END AS BIGINT) AS cc_bp
    FROM deg d LEFT JOIN per p USING (node)
    ORDER BY n_triangles DESC, node LIMIT 20
    """,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient
    (operators.graph.triangle_counts) over the co-purchase graph of every
    7th order — the cohesion metric behind community-quality and
    recommender-diversity analysis. Wedge build and closure are pure
    equality joins (each triangle counted once as a < b < c); the
    integer-basis-point coefficient makes the whole result SQL-exact.
    The order subset bounds wedge volume (Σ deg²) the same way every
    production triangle counter bounds hub degrees. NEW in round 4
    (post-tail); round-5 rotation candidate."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    edges = G.copurchase_edges(li)
    return (
        G.triangle_counts(edges)
        .orderBy(F.desc("n_triangles"), "node")
        .limit(20)
    )


_BFS_HOPS = 4
_BFS_SOURCES = 3


def _bfs_oracle(hops: int = _BFS_HOPS, n_src: int = _BFS_SOURCES) -> str:
    parts = [
        "WITH li AS MATERIALIZED ("
        " SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem"
        " WHERE l_orderkey % 7 = 0),",
        "pr AS MATERIALIZED ("
        " SELECT a.p AS u, b.p AS v FROM li a JOIN li b"
        " ON a.o = b.o AND a.p < b.p),",
        "edges AS MATERIALIZED ("
        " SELECT DISTINCT src, dst FROM ("
        "  SELECT u AS src, v AS dst FROM pr"
        "  UNION ALL SELECT v, u FROM pr)),",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),",
        f"v0 AS MATERIALIZED ("
        f" SELECT node, 0 AS dist FROM ("
        f"  SELECT node FROM nodes ORDER BY node LIMIT {n_src})),",
    ]
    for k in range(1, hops + 1):
        prev, vis = f"v{k - 1}", f"v{k - 1}"
        # visited so far = v{k-1} (it already accumulates all levels)
        parts.append(
            f"f{k} AS MATERIALIZED ("
            f" SELECT DISTINCT e.dst AS node FROM edges e"
            f" JOIN {prev} p ON e.src = p.node AND p.dist = {k - 1}),"
        )
        parts.append(
            f"v{k} AS MATERIALIZED ("
            f" SELECT node, dist FROM {vis}"
            f" UNION ALL"
            f" SELECT f.node, {k} AS dist FROM f{k} f"
            f" LEFT JOIN {vis} v ON f.node = v.node WHERE v.node IS NULL),"
        )
    parts.append(
        f"fin AS ("
        f" SELECT coalesce(v.dist, -1) AS dist, n.node"
        f" FROM nodes n LEFT JOIN v{hops} v ON n.node = v.node)"
        f" SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes,"
        f" min(node) AS min_node, max(node) AS max_node"
        f" FROM fin GROUP BY dist ORDER BY dist"
    )
    return "\n".join(parts)


@query("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS reachability profile (operators.graph.bfs_hops):
    hop-distance histogram from the three lowest-id parts over the
    degree-bounded co-purchase subgraph (the triangle gate's order-key
    subset, which keeps real hop diversity — the full basket graph has
    diameter ~2). dist = −1 counts nodes unreached within 4 hops. The
    frontier-expansion iterative primitive beside CC (fixed-point
    reachability) and LPA (plurality diffusion); per level one src-keyed
    equality join + distinct + left-anti first-discovery filter, frontier
    and visited sets broadcast (dimension graph) so edges never shuffle.
    The oracle replays every BFS level in materialized CTEs — a level-
    ordering or first-discovery bug flips the hash, not just the counts."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 7 == 0)
    edges = G.copurchase_edges(li)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    sources = nodes.orderBy("node").limit(_BFS_SOURCES)
    visited = G.bfs_hops(
        edges, sources, max_hops=_BFS_HOPS, broadcast_frontier=True
    )
    profile = (
        nodes.join(visited, "node", "left")
        .select(F.coalesce("dist", F.lit(-1)).alias("dist"), "node")
        .groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("dist")
    )
    return profile


# ---------------------------------------------------------------------------
# k-core decomposition (round 8)
# ---------------------------------------------------------------------------

_KC_K = 4
_KC_ROUNDS = 8  # fixed point measured at round 5/6/6 for sf0.001/0.01/0.1
_KC_QTY = 44    # lineitem slice: the full co-purchase graph is too dense
#                 to peel (min degree 42 at sf0.01); the high-quantity slice
#                 cascades 478 -> 150 -> 38 -> 23 -> 21 survivors at k=4


def _kcore_oracle(k: int = _KC_K, rounds: int = _KC_ROUNDS) -> str:
    parts = [
        "WITH li AS MATERIALIZED ("
        f" SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem"
        f" WHERE l_quantity >= {_KC_QTY}),",
        "pr AS MATERIALIZED ("
        " SELECT a.p AS u, b.p AS v FROM li a JOIN li b"
        " ON a.o = b.o AND a.p < b.p),",
        "e0 AS MATERIALIZED ("
        " SELECT DISTINCT src, dst FROM ("
        "  SELECT u AS src, v AS dst FROM pr"
        "  UNION ALL SELECT v, u FROM pr)),",
    ]
    for r in range(1, rounds + 1):
        prev = f"e{r - 1}"
        parts.append(
            f"k{r} AS MATERIALIZED ("
            f" SELECT src FROM (SELECT src, count(*) AS d FROM {prev}"
            f" GROUP BY src) WHERE d >= {k}),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED ("
            f" SELECT e.src, e.dst FROM {prev} e"
            f" JOIN k{r} a ON e.src = a.src"
            f" JOIN k{r} b ON e.dst = b.src),"
        )
    parts.append(
        f"fin AS (SELECT src AS partkey, CAST(count(*) AS BIGINT) AS core_degree"
        f" FROM e{rounds} GROUP BY src)"
        f" SELECT partkey, core_degree FROM fin ORDER BY partkey"
    )
    return "\n".join(parts)


@query("graph_kcore_parts", oracle=_kcore_oracle())
def graph_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (operators.graph.kcore, Seidman 1983): the
    maximal subgraph where every surviving part keeps ≥ 4 co-purchase
    neighbors — the density primitive connected components cannot express
    (CC keeps anything REACHABLE; k-core keeps only the mutually-dense
    club, the spam-ring/community-core filter shape). Runs 8 synchronous
    peeling rounds over the high-quantity co-purchase slice (the full
    graph's min degree is 42 — nothing to peel; the slice cascades
    478 → 150 → 38 → 23 → 21 survivors at sf0.01, fixed point by round 6
    at every scale, pytest-pinned with a rounds+1 equality). The oracle
    replays edge build and ALL EIGHT degree/filter levels as materialized
    CTEs — a join-direction, threshold, or round-count bug flips the
    hash. Scale shape: per round one degree aggregate + two semi-joins,
    each level lazily checkpointed (the label_propagation discipline)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= _KC_QTY)
    edges = G.copurchase_edges(li)
    out = G.kcore(edges, k=_KC_K, rounds=_KC_ROUNDS)
    return out.select(
        F.col("node").alias("partkey"), "core_degree"
    ).orderBy("partkey")
