"""Integer PageRank (operators/graph.py): exact agreement with a Python
replica on small graphs, centrality ordering on a star, co-purchase edge
construction, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import graph as G


def _py_pagerank(edges: set[tuple[int, int]], iters: int = 5) -> dict[int, int]:
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {n: G.PR_SCALE for n in nodes}
    base = G.PR_SCALE * (100 - G.PR_DAMPING_PCT) // 100
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: base + G.PR_DAMPING_PCT * s[n] // 100 for n in nodes}
    return r


def _edges_df(spark, pairs):
    return spark.createDataFrame(list(pairs), "src long, dst long")


def test_pagerank_matches_python_replica(spark):
    # a small asymmetric directed graph with a dangling-free structure
    pairs = {(1, 2), (2, 1), (2, 3), (3, 1), (3, 4), (4, 3), (1, 4), (4, 1)}
    got = {
        r.node: r.rank_micro
        for r in G.pagerank(_edges_df(spark, pairs), iterations=5).collect()
    }
    assert got == _py_pagerank(pairs)


def test_pagerank_star_hub_dominates(spark):
    # undirected star: hub 0 linked to 1..6 — hub must outrank every leaf,
    # and all leaves tie exactly (integer determinism)
    star = {(0, i) for i in range(1, 7)}
    sym = star | {(b, a) for a, b in star}
    got = {
        r.node: r.rank_micro
        for r in G.pagerank(_edges_df(spark, sym), iterations=5).collect()
    }
    leaf_ranks = {got[i] for i in range(1, 7)}
    assert len(leaf_ranks) == 1
    assert got[0] > leaf_ranks.pop()


def test_copurchase_edges_symmetric_and_bounded(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 13), (3, 14)],
        "l_orderkey long, l_partkey long",
    )
    edges = {(r.src, r.dst) for r in G.copurchase_edges(li).collect()}
    # order 1 links {10,11,12} pairwise; order 2 links {10,13}; order 3 none
    expect_undirected = {(10, 11), (10, 12), (11, 12), (10, 13)}
    expect = expect_undirected | {(b, a) for a, b in expect_undirected}
    assert edges == expect


def test_pagerank_plan_no_cartesian(spark):
    pairs = {(1, 2), (2, 1), (2, 3), (3, 2)}
    plan = (
        G.pagerank(_edges_df(spark, pairs), iterations=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_label_propagation_two_triangles_with_bridge(spark):
    # two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4: density
    # keeps the communities separate (where connected components would
    # merge them into one)
    tri = {(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)}
    sym = tri | {(b, a) for a, b in tri}
    got = {
        r.node: r.community
        for r in G.label_propagation(_edges_df(spark, sym), iterations=4).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    # the second triangle keeps its OWN community (labels can migrate —
    # here the bridge node's original label 3 wins inside {4,5,6} — but
    # density stops the two triangles merging)
    assert got[4] == got[5] == got[6]
    assert got[4] != got[1]
    # connected components by contrast merges everything to label 1
    from payroll_etl_fastapi_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in tri], "id_a long, id_b long"
    )
    cc = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(cc.values()) == {1}


def test_label_propagation_matches_python_replica(spark):
    import random

    rng = random.Random(3)
    pairs = {(rng.randrange(0, 12), rng.randrange(0, 12)) for _ in range(25)}
    pairs = {(a, b) for a, b in pairs if a != b}
    sym = pairs | {(b, a) for a, b in pairs}

    def replica(edges, iters):
        nodes = {u for u, _ in edges} | {v for _, v in edges}
        lab = {n: n for n in nodes}
        for _ in range(iters):
            new = {}
            for v in nodes:
                cnt: dict[int, int] = {}
                for a, b in edges:
                    if b == v:
                        cnt[lab[a]] = cnt.get(lab[a], 0) + 1
                if cnt:
                    new[v] = min(
                        cnt, key=lambda L: (-cnt[L], L)
                    )
            lab = {**lab, **new}
        return lab

    got = {
        r.node: r.community
        for r in G.label_propagation(_edges_df(spark, sym), iterations=3).collect()
    }
    assert got == replica(sym, 3)


def test_triangle_counts_known_graph(spark):
    # K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles, cc = 1.0;
    # pendant node 5 attached to 1: degree 1, no triangles
    k4 = {(a, b) for a in range(1, 5) for b in range(1, 5) if a < b}
    pairs = k4 | {(1, 5)}
    sym = pairs | {(b, a) for a, b in pairs}
    got = {r.node: r for r in G.triangle_counts(_edges_df(spark, sym)).collect()}
    for n in (2, 3, 4):
        assert got[n].n_triangles == 3
        assert got[n].degree == 3
        assert got[n].cc_bp == 10000
    assert got[1].n_triangles == 3 and got[1].degree == 4
    # cc(1) = 2*3/(4*3) = 0.5
    assert got[1].cc_bp == 5000
    assert got[5].n_triangles == 0 and got[5].cc_bp == 0


def test_triangle_counts_no_triangles_in_a_path(spark):
    path = {(1, 2), (2, 3), (3, 4)}
    sym = path | {(b, a) for a, b in path}
    got = {r.node: r.n_triangles for r in G.triangle_counts(_edges_df(spark, sym)).collect()}
    assert all(v == 0 for v in got.values())


def test_bfs_hops_path_graph(spark):
    """Path 1-2-3-4-5 plus isolated edge 8-9: dist from {1} is the path
    index, capped at max_hops; unreached nodes are absent."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)], ["u", "v"]
    )
    edges = G.symmetric_edges(pairs)
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.dist for r in G.bfs_hops(edges, sources, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond cap, 8/9 unreachable


def test_bfs_hops_multi_source_takes_nearest(spark):
    """Two sources on a path: every node gets the distance to the NEAREST
    source (first-discovery wins), identical broadcast or not."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["u", "v"]
    )  # path 1..8
    edges = G.symmetric_edges(pairs)
    sources = spark.createDataFrame([(1,), (8,)], ["node"])
    want = {1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 2, 7: 1, 8: 0}
    for bc in (False, True):
        got = {
            r.node: r.dist
            for r in G.bfs_hops(
                edges, sources, max_hops=3, broadcast_frontier=bc
            ).collect()
        }
        assert got == want, bc


def test_bfs_hops_cycle_no_revisit(spark):
    """On a 4-cycle the wave meets itself: each node keeps its FIRST
    discovery level, never a later one."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    edges = G.symmetric_edges(pairs)
    sources = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.dist for r in G.bfs_hops(edges, sources, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_pagerank_quantization_error_vs_float_reference(spark):
    """Quantization-quality floor (round 7 quality series): the integer DIV
    quantization exists for oracle replayability — this pins what it COSTS
    vs float PageRank (same damping/iterations/dangling convention) on a
    seeded 120-node preferential graph: every node's rank within 0.5%
    relative, and the top-10 ORDER identical. A quantization change that
    degrades ranking fidelity (coarser scale, mis-ordered DIVs
    accumulating) fails here while the determinism gates stay green."""
    import numpy as np

    rng = np.random.default_rng(11)
    n = 120
    pairs = set()
    targets = [int(t) for t in rng.integers(0, 20, 400)]  # hub-heavy
    sources = [int(s) for s in rng.integers(0, n, 400)]
    for s, t in zip(sources, targets):
        if s != t:
            pairs.add((s, t))
    for i in range(n - 1):  # ensure every node has an out-edge
        pairs.add((i, i + 1))
    pairs.add((n - 1, 0))
    edges = sorted(pairs)

    got = {
        r.node: r.rank_micro
        for r in G.pagerank(_edges_df(spark, edges), iterations=5).collect()
    }

    # float reference, identical update rule shape
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: 1.0 for v in range(n)}
    d = G.PR_DAMPING_PCT / 100.0
    for _ in range(5):
        contrib = {}
        for s, t in edges:
            contrib[t] = contrib.get(t, 0.0) + ranks[s] / deg[s]
        ranks = {v: (1 - d) + d * contrib.get(v, 0.0) for v in range(n)}

    for v in range(n):
        rel = abs(got[v] / G.PR_SCALE - ranks[v]) / ranks[v]
        assert rel < 0.005, (v, got[v], ranks[v])
    top_int = sorted(range(n), key=lambda v: (-got[v], v))[:10]
    top_flt = sorted(range(n), key=lambda v: (-ranks[v], v))[:10]
    assert top_int == top_flt


# ---------------------------------------------------------------------------
# round 8: k-core decomposition
# ---------------------------------------------------------------------------


def test_kcore_semantics_and_cascade(spark):
    """A 4-clique survives k=3 peeling; a pendant chain hanging off it
    peels away over SUCCESSIVE rounds (each removal lowers the next node's
    degree) — the cascade single-round filtering misses."""
    from payroll_etl_fastapi_spark.operators import graph as G

    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(3, 10), (10, 11), (11, 12)]
    pairs = spark.createDataFrame(clique + chain, "u long, v long")
    edges = G.symmetric_edges(pairs)
    core = {r.node: r.core_degree for r in G.kcore(edges, k=3, rounds=5).collect()}
    assert core == {0: 3, 1: 3, 2: 3, 3: 3}
    # one round is NOT enough: node 10 still has degree 2... below 3 ->
    # dropped round 1; 11 drops round 2; 12 round 3. rounds=1 leaves 11, 12
    partial = {r.node for r in G.kcore(edges, k=3, rounds=1).collect()}
    assert {11, 12} & partial == set()  # 11 and 12 had degree < 3 already
    # k above the clique degree empties the graph
    assert G.kcore(edges, k=4, rounds=5).count() == 0


def test_kcore_gate_params_reach_fixed_point(spark):
    """The gate's 8 rounds are PAST the peeling depth on its corpus: one
    extra round changes nothing (sf0.001 — fixed point measured at 5)."""
    from payroll_etl_fastapi_spark.operators import graph as G
    from payroll_etl_fastapi_spark.plans.suite_graph import _KC_K, _KC_QTY, _KC_ROUNDS

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").filter(
        F.col("l_quantity") >= _KC_QTY
    )
    edges = G.copurchase_edges(li)
    a = {(r.node, r.core_degree) for r in G.kcore(edges, _KC_K, _KC_ROUNDS).collect()}
    b = {(r.node, r.core_degree) for r in G.kcore(edges, _KC_K, _KC_ROUNDS + 1).collect()}
    assert a == b and len(a) > 0
