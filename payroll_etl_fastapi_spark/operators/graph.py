"""Iterative graph algorithms on DataFrames: integer-quantized PageRank.

Complements the dedup family's connected components (operators/dedup.py:425)
— the other classic iterative-join graph primitive a relational engine is
asked for (influence/centrality over co-occurrence, citation, or link
graphs; at LLM-pipeline scale: domain authority over a crawl's link graph
as a quality prior, the Common-Crawl-era PageRank-as-quality-signal).

The quantization is the point: classic PageRank divides ranks by degrees
in IEEE doubles, so cross-partition sum order perturbs low bits and no SQL
oracle can replay it. Here ranks live in integer microunits and BOTH
divisions are integer (contrib = rank DIV degree; the damping multiply is
``(85 * s) DIV 100``), so every iteration is aggregation-order-proof and a
DuckDB oracle re-runs all K iterations bit-for-bit. The flooring drops at
most (degree-1)/scale of a node's outgoing mass per iteration — a ~1e-6
relative perturbation that cannot reorder meaningfully-separated ranks.

Scale shape (100 TB graph): each iteration is ONE equality join
(edges ⋈ ranks on src — both sides partitioned by the join key, so a
cluster reuses the exchange across iterations) + ONE grouped sum with
map-side combine + ONE left join back to the node set. Degrees and the
node set are computed once and lazily localCheckpoint'd, so the edge scan
is not re-run per iteration reference. No collect, no window, no Python.
K is a fixed small constant (power iteration converges geometrically at
damping^k); the plan is K chained join/agg stages, not a driver loop of
actions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_DAMPING_PCT = 85


def symmetric_edges(pairs: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Distinct symmetric edge set from a CANONICAL (u < v) pair list.

    Deduplicates the canonical pairs FIRST, then mirrors — u < v guarantees
    the forward and reversed sets are disjoint, so the union needs no
    second distinct: one shuffle over half the rows instead of one over
    the full symmetric set. The deduped frame is lazily checkpointed so
    the mirror branch (and every downstream consumer — degrees, node set,
    iterations) reads the materialized pairs instead of re-running the
    generating join per branch."""
    fwd = (
        pairs.select(F.col(u).alias("src"), F.col(v).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev)


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """(src, dst) symmetric co-occurrence edges: items sharing an order.

    Pair generation is ARRAY-LOCAL: one basket-keyed aggregate collects
    each order's distinct item set (collect_set dedups inside the
    aggregate — no separate distinct shuffle), and the u < v pairs come
    from nested transforms over the sorted array — no self-join at all.
    ONE shuffle where the join formulation needed three (distinct,
    both join sides). Per-order fan-out stays bounded by basket size
    (≤ 7 in TPC-H shapes, a few dozen in real baskets); a pathological
    mega-basket is a visible array, not a hidden join blow-up. The sorted
    set is materialized into a real column BEFORE the lambdas (the
    re-evaluation pitfall dedup.shingles documents)."""
    baskets = (
        lineitem.select(F.col(order_col).alias("o"), F.col(item_col).alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    n = F.size(F.col("ps"))
    pairs = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, n - i - 1),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    flat = baskets.select(F.explode(pairs).alias("e")).select("e.u", "e.v")
    return symmetric_edges(flat)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = PR_DAMPING_PCT,
    scale: int = PR_SCALE,
    broadcast_ranks: bool = False,
    symmetric_input: bool = False,
) -> DataFrame:
    """(node, rank_micro) after ``iterations`` integer power iterations.

    ``edges`` is a directed (src, dst) frame; for undirected graphs pass
    the symmetric closure (`symmetric_edges`) — then there are no dangling
    nodes (every node with an in-edge has an out-edge) and the standard
    dangling-mass redistribution is unnecessary. Nodes appearing only as
    dst still receive rank; nodes with no in-edges settle at the base
    (1-d) mass. r0 = ``scale`` per node; each step:
    r'(v) = ((100-damping_pct)·scale) DIV 100
            + (damping_pct · Σ_{u→v} r(u) DIV deg(u)) DIV 100.

    ``broadcast_ranks=True`` is the DIMENSION-GRAPH mode (node set small
    enough to broadcast — product catalogs, domains, entities): the rank
    frame ships to the executors each iteration, so the EDGE table is
    never shuffled for the join and the only per-iteration exchange is the
    map-side-combined grouped sum (≤ #nodes rows per task). Leave False
    for web-scale graphs where ranks themselves are huge — there the join
    runs shuffle-keyed on src and a cluster reuses that partitioning
    across iterations."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # The node set is only consumed by the iterations == 0 return and the
    # non-symmetric per-round left join: round 1's ranks join is skipped
    # below (r0 is the constant `scale`), so the symmetric path never
    # touches nodes once it iterates.
    need_nodes = iterations == 0 or not symmetric_input
    if not need_nodes:
        nodes = None
    elif symmetric_input:
        # SYMMETRIC fast path (round 12): on a symmetric edge set every
        # node appears as src AND has at least one in-edge, so the node set
        # IS deg's key column (no src∪dst union-distinct exchange) and
        # every round's contribution covers every node (the nodes left-join
        # per round is a no-op — coalesce(s, 0) can never fire). Ranks are
        # identical; the caller asserts symmetry, exactly like
        # `broadcast_ranks` asserts dimension scale.
        nodes = deg.select(F.col("src").alias("node")).localCheckpoint(
            eager=False
        )
    else:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=False)
        )
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    base = (scale * (100 - damping_pct)) // 100
    if iterations == 0:
        ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    else:
        ranks = None
    bc = F.broadcast if broadcast_ranks else (lambda df: df)
    for i in range(iterations):
        if i == 0:
            # ROUND-1 SKIP (round 13): r0 is the constant `scale` for every
            # node, and the ranks join only ever matches src rows (dst-only
            # nodes have no out-edges, so r0's extra keys never joined) —
            # substituting the literal is the identical contribution with
            # no join, no broadcast, and no r0 frame at all.
            contrib = (
                edges_deg.select(
                    "dst", F.expr(f"CAST({int(scale)} AS BIGINT) DIV d").alias("c")
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        else:
            contrib = (
                edges_deg.join(bc(ranks), edges_deg["src"] == ranks["node"])
                .select("dst", F.expr("r DIV d").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
        if symmetric_input:
            # contrib's dst key already covers the full node set
            ranks = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr(f"{damping_pct} * s DIV 100"))
                .cast("long")
                .alias("r"),
            )
            continue
        ranks = nodes.join(
            bc(contrib), nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(s, 0) DIV 100")
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    broadcast_labels: bool = False,
    symmetric_input: bool = False,
) -> DataFrame:
    """(node, community): synchronous label propagation (Raghavan et al.
    2007) over a SYMMETRIC edge set — each round every node adopts the
    most frequent label among its neighbors, ties broken by the SMALLEST
    label, for a fixed ``iterations`` rounds. The deterministic tie-break
    plus synchronous updates make the result a pure function of the graph
    (classic LPA breaks ties randomly; this variant is SQL-replayable and
    retry-stable). Complements connected components (min-id reachability)
    with DENSITY-sensitive communities: bridges don't merge groups.

    Scale shape (100 TB): per round, one src-keyed equality join
    (labels broadcast in dimension-graph mode, same contract as
    `pagerank`) and ONE map-side-combinable aggregate: `mode(label,
    deterministic=true)` per node, whose documented tie-break — lowest
    value among the most frequent — IS "highest count, then smallest
    label". (Rounds 4-12 ran this as TWO hash aggregates, a (node, label)
    grouped count plus a struct-max argmax; the mode() swap halves the
    per-round exchanges for the same per-group state, bounded by the
    node's distinct neighbor labels ≤ degree. No window, no sort.)
    Round 1 never joins: l0 maps every node to itself, so the first
    round's neighbor frame is just (dst, src) off the edge list — which
    also means the node set is never materialized when iterating (a node
    without in-edges drops out of round 1's output exactly as it did out
    of the round-1 join). Fixed K rounds: one chained plan, no driver
    loop of actions."""
    if iterations <= 0:
        if symmetric_input:
            # symmetric edge set ⇒ the src column alone carries every node
            # (round 12; same contract note as pagerank's symmetric_input)
            nodes = edges.select(F.col("src").alias("node")).distinct()
        else:
            nodes = (
                edges.select(F.col("src").alias("node"))
                .unionByName(edges.select(F.col("dst").alias("node")))
                .distinct()
            )
        return nodes.select("node", F.col("node").alias("community"))
    ed = edges.localCheckpoint(eager=False)
    labels = None
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    for i in range(iterations):
        if i == 0:
            # ROUND-1 SKIP (round 13): joining l0 = (node, node) against
            # edge src is the identity — every edge row gets label = src.
            nbr = ed.select(F.col("dst").alias("v"), F.col("src").alias("label"))
        else:
            nbr = ed.join(bc(labels), ed["src"] == labels["node"]).select(
                F.col("dst").alias("v"), "label"
            )
        labels = nbr.groupBy(F.col("v").alias("node")).agg(
            F.mode("label", True).alias("label")
        )
    return labels.select("node", F.col("label").alias("community"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node, degree, n_triangles, cc_bp): per-node triangle participation
    and local clustering coefficient (2T / deg·(deg-1), integer basis
    points) over a SYMMETRIC edge set — the cohesion metric behind
    community quality, spam-graph, and recommender-diversity analyses.

    Plan shape: canonicalize to u < v (each triangle counted once as
    a < b < c), build wedges with ONE equality self-join on the middle
    node, close them with ONE more equality join on the (a, c) pair, then
    explode each triangle's three corners into a grouped count. All
    equality joins — no cartesian; wedge volume is Σ deg(b)², the classic
    triangle-counting cost, so callers bound degrees (sample or filter
    hubs) exactly as every production triangle counter does."""
    e = edges.filter(F.col("src") < F.col("dst")).localCheckpoint(eager=False)
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("degree").cast("long").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CAST(CASE WHEN degree < 2 THEN 0"
                " ELSE 2 * coalesce(n_triangles, 0) * 10000"
                "      DIV (degree * (degree - 1)) END AS BIGINT)"
            ).alias("cc_bp"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    broadcast_frontier: bool = False,
) -> DataFrame:
    """(node, dist): multi-source breadth-first search over a SYMMETRIC edge
    set — dist = hop count to the NEAREST source, exploring ``max_hops``
    levels. Nodes not reached within the cap are absent (callers left-join
    the node set to surface them). ``sources`` is a (node) frame.

    The iterative frontier-expansion primitive beside the label-diffusion
    ones (connected components propagates min-ids to a fixed point, LPA
    diffuses plurality labels; BFS tracks the expanding REACHED SET, which
    neither expresses): per level ONE src-keyed equality join fans the
    frontier to its neighbors, one distinct dedups the level, one left-anti
    join against the visited set keeps first discoveries only — so a node's
    dist is final the level it first appears (the BFS invariant), making
    the result a pure function of (graph, sources) and therefore
    SQL-replayable level by level.

    Scale shape (100 TB of edges): the per-level joins are equality joins
    on src; each level's output is lazily localCheckpoint'd so lineage
    stays flat (the CC/LPA convention — swap for checkpoint() on a real
    cluster). With ``broadcast_frontier`` (dimension-sized graphs) the
    frontier and visited sets ride broadcasts and the edge table NEVER
    shuffles; for web-scale graphs leave it False and the frontier join
    shuffles the (much smaller) frontier against the edge partitioning.
    A frontier that goes empty makes the remaining levels no-op joins."""
    visited = (
        sources.select(F.col("node").cast("long").alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("node")
    maybe_b = F.broadcast if broadcast_frontier else (lambda df: df)
    for h in range(1, max_hops + 1):
        reached = (
            edges.join(maybe_b(frontier.withColumnRenamed("node", "src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = (
            reached.join(maybe_b(visited.select("node")), "node", "left_anti")
            .select("node", F.lit(h).alias("dist"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(new)
        frontier = new.select("node")
    return visited


def kcore(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """Synchronous k-core peeling (Seidman 1983 / the Batagelj-Zaveršnik
    goal run as bulk-synchronous rounds): each round simultaneously drops
    EVERY node whose current degree is below ``k``, then recomputes degrees
    over the surviving edges. After enough rounds the survivors are exactly
    the k-core — the maximal subgraph where every node keeps ≥ k neighbors
    (the density primitive behind spam-cluster and community filtering that
    connected components can't express: CC keeps anything reachable, k-core
    keeps only the mutually-dense part).

    ``rounds`` is FIXED (the quantized-PageRank convention): synchronous
    peeling is deterministic and each round is a replayable CTE level; a
    caller that wants the exact fixed point picks rounds ≥ the peeling
    depth (the gate pins convergence at its params with an extra-round
    equality pytest).

    Input: symmetric (src, dst) edges. Output: (node, core_degree) of the
    survivors. Scale shape: per round ONE degree aggregate + two
    semi-joins keyed on the endpoints; each level is lazily checkpointed
    so round r+1 reads materialized survivors instead of replaying the
    whole peeling lineage (the label_propagation discipline)."""
    alive = edges
    for _ in range(rounds):
        deg = alive.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("src")
        alive = (
            alive.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        alive.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
        .select(F.col("src").alias("node"), "core_degree")
    )
