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
