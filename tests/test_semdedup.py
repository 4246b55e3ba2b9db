"""semantic_dedup (operators/similarity.py): keep-lowest-id rule inside a
cluster, cross-cluster misses (the published algorithm's recall trade),
threshold behavior, and assignment tie-breaking."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import similarity as sim


def _frame(spark, X):
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_keeps_lowest_id_within_cluster(spark):
    # three near-identical vectors near +5, two distinct ones near -5
    base = np.ones(8) * 5.0
    X = np.stack(
        [base, base * 1.0001, base * 0.9999, -base, -base * 3.0]
    )
    cents = [[5.0] * 8, [-5.0] * 8]
    out = {
        r.id: (r.cluster_id, r.is_dropped)
        for r in sim.semantic_dedup(_frame(spark, X), cents, 0.95).collect()
    }
    assert out[0] == (0, 0)  # lowest id kept
    assert out[1] == (0, 1) and out[2] == (0, 1)  # near-dups dropped
    # -base and -3*base: cosine 1.0 (parallel), same cluster -> 4 dropped too
    assert out[3] == (1, 0) and out[4] == (1, 1)


def test_cross_cluster_duplicates_are_missed_by_design(spark):
    v = np.ones(8)
    X = np.stack([v * 4.9, v * 5.1])  # same direction, near both sides of 5
    # centroids split them into different clusters
    cents = [[4.9] * 8, [5.1] * 8]
    out = {r.id: r.is_dropped for r in sim.semantic_dedup(_frame(spark, X), cents, 0.9).collect()}
    assert out == {0: 0, 1: 0}  # cosine 1.0 but never compared
    # one shared cluster finds them
    out1 = {r.id: r.is_dropped for r in sim.semantic_dedup(_frame(spark, X), [[5.0] * 8], 0.9).collect()}
    assert out1 == {0: 0, 1: 1}


def test_threshold_gates_the_drop(spark):
    a = np.ones(8)
    b = np.concatenate([np.ones(4), -np.ones(4)])  # cosine 0 to a
    X = np.stack([a, b])
    out = {r.id: r.is_dropped for r in sim.semantic_dedup(_frame(spark, X), [[0.5] * 8], 0.5).collect()}
    assert out == {0: 0, 1: 0}


def test_literal_and_broadcast_assignment_are_bit_identical(spark):
    rng = np.random.default_rng(21)
    X = rng.normal(size=(300, 16)).astype(np.float32).astype(float)
    cents = [[float(v) for v in rng.uniform(-1, 1, 16)] for _ in range(7)]
    lit = sorted(
        (r.id, r.cluster_id, r.is_dropped)
        for r in sim.semantic_dedup(
            _frame(spark, X), cents, 0.9, assign_via="literal"
        ).collect()
    )
    bc = sorted(
        (r.id, r.cluster_id, r.is_dropped)
        for r in sim.semantic_dedup(
            _frame(spark, X), cents, 0.9, assign_via="broadcast"
        ).collect()
    )
    assert lit == bc


def test_gemm_assignment_agrees_with_fold_paths(spark):
    """assign_via='gemm' (Arrow-batched numpy matmul — the production path
    for large quantizers, PLANS.md §gemm assignment) must route every vector
    to the same cluster as the bit-exact fold paths away from ties: BLAS
    reassociates sums, so only near-ties (distance gaps at float rounding)
    could flip, and this corpus has none. Exact ties break the same way in
    both (np.argmin first index == struct-min smaller centroid id)."""
    rng = np.random.default_rng(21)
    X = rng.normal(size=(300, 16)).astype(np.float32).astype(float)
    cents = [[float(v) for v in rng.uniform(-1, 1, 16)] for _ in range(7)]
    bc = sorted(
        (r.id, r.cluster_id, r.is_dropped)
        for r in sim.semantic_dedup(
            _frame(spark, X), cents, 0.9, assign_via="broadcast"
        ).collect()
    )
    gm = sorted(
        (r.id, r.cluster_id, r.is_dropped)
        for r in sim.semantic_dedup(
            _frame(spark, X), cents, 0.9, assign_via="gemm"
        ).collect()
    )
    assert gm == bc


def test_gemm_assignment_exact_tie_takes_smaller_centroid_id(spark):
    # a vector exactly between two IDENTICAL centroids: distances are equal
    # bit-for-bit, so argmin must take the first (smaller centroid id) —
    # same rule as the fold paths' struct-min
    X = np.array([[1.0, 0.0], [0.0, 2.0]])
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 2.0]]
    got = {
        r.id: r.cluster_id
        for r in sim._assign_clusters_gemm(
            _frame(spark, X), cents, "vec_id", "embedding"
        ).collect()
    }
    assert got == {0: 0, 1: 2}


def test_auto_assign_via_selection_boundaries(spark, monkeypatch):
    """round 8 (VERDICT r7 #6): auto promotes literal → broadcast → gemm at
    the documented cutoffs. Pinned by intercepting which concrete path
    _assign_clusters takes (the selection, not the arithmetic — agreement
    is pinned separately)."""
    chosen = {}
    real_gemm = sim._assign_clusters_gemm

    def spy_gemm(corpus, cents, id_col, vec_col):
        chosen["via"] = "gemm"
        return real_gemm(corpus, cents, id_col, vec_col)

    monkeypatch.setattr(sim, "_assign_clusters_gemm", spy_gemm)
    X = np.eye(4, 8)
    df = _frame(spark, X)

    def pick(n_cents, dim=8):
        chosen.clear()
        cents = [[float(i == j) for j in range(dim)] for i in range(n_cents)]
        plan = sim._assign_clusters(df, cents, "vec_id", "embedding", "auto")
        if "via" in chosen:
            return "gemm"
        # fold paths: the broadcast plan carries the _cents crossJoin, the
        # literal plan does not reference a second source
        return "broadcast" if "_cents" in plan._jdf.queryExecution().logical().toString() else "literal"

    assert pick(64) == "literal"        # 64 x 8 = 512 terms, at the cutoff
    assert pick(65) == "broadcast"      # 65 x 8 = 520 terms, past it
    assert pick(sim.GEMM_AUTO_CENTROIDS) == "broadcast"
    assert pick(sim.GEMM_AUTO_CENTROIDS + 1) == "gemm"


def test_gemm_auto_promotion_agrees_with_broadcast_past_cutoff(spark):
    """Routing agreement at the promotion boundary: a separated corpus
    assigned with k just past GEMM_AUTO_CENTROIDS routes identically under
    auto (gemm) and the explicit broadcast fold."""
    rng = np.random.default_rng(5)
    k = sim.GEMM_AUTO_CENTROIDS + 8
    dim = 8
    cents = [list(map(float, rng.normal(size=dim) * 10)) for _ in range(k)]
    X = np.array(cents[:40]) + rng.normal(scale=1e-3, size=(40, dim))
    df = _frame(spark, X)
    via_auto = {
        r.id: r.cluster_id
        for r in sim._assign_clusters(df, cents, "vec_id", "embedding", "auto").collect()
    }
    via_fold = {
        r.id: r.cluster_id
        for r in sim._assign_clusters(
            df, cents, "vec_id", "embedding", "broadcast"
        ).collect()
    }
    assert via_auto == via_fold
    assert set(via_auto.values()) == set(range(40))


def test_gemm_preserves_non_bigint_id_type(spark):
    """ADVICE r7: the gemm mapInPandas schema derives the id field's type
    from the input (the literal/broadcast paths always preserved it; the
    hardcoded `id long` broke non-bigint ids only on this path)."""
    rows = [(f"doc-{i}", [float(i), 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = sim._assign_clusters_gemm(df, [[0.0, 0.0], [3.0, 0.0]], "vec_id", "embedding")
    assert out.schema["id"].dataType.simpleString() == "string"
    got = {r.id: r.cluster_id for r in out.collect()}
    assert got == {"doc-0": 0, "doc-1": 0, "doc-2": 1, "doc-3": 1}
