"""Unit tests for operators/similarity.py: exact top-k against a numpy
brute-force oracle, LSH candidate semantics, and near-dup pair recovery."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from payroll_etl_fastapi_spark.operators import similarity as sim

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    return spark.createDataFrame(rows, SCHEMA), vecs


def _numpy_topk(vecs: np.ndarray, qids: list[int], k: int) -> dict[int, list[int]]:
    V = vecs.astype(np.float64)
    norms = np.sqrt((V * V).sum(axis=1))
    out = {}
    for q in qids:
        cos = (V @ V[q]) / (norms * norms[q])
        order = sorted(
            (i for i in range(len(V)) if i != q), key=lambda i: (-cos[i], i)
        )
        out[q] = order[:k]
    return out


def test_hyperplanes_deterministic():
    a = sim.hyperplane_signs(16, 64)
    b = sim.hyperplane_signs(16, 64)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    # not degenerate: both signs appear in every plane
    assert all(1.0 in row and -1.0 in row for row in a)


def test_cosine_topk_matches_numpy(emb_df):
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") < 3)
    got = sim.cosine_topk(df, queries, k=5).collect()
    expected = _numpy_topk(vecs, [0, 1, 2], k=5)
    by_query: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r.neighbor_id)
    assert by_query == expected


def test_cosine_topk_excludes_self_and_caps_k(emb_df):
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") == 0)
    rows = sim.cosine_topk(df, queries, k=1000).collect()
    assert all(r.neighbor_id != 0 for r in rows)
    assert len(rows) == 39  # corpus minus self


def test_lsh_topk_subset_of_exact_ranking(emb_df):
    """LSH results re-rank a candidate subset with the same exact cosine, so
    every returned (query, neighbor) must rank consistently with brute force
    and similarity values must agree bit-for-bit."""
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim.cosine_topk(df, queries, k=1000).collect()
    }
    # 2-bit bands → high collision rate, so candidates exist even on 40
    # random low-dim vectors
    got = sim.lsh_topk(df, queries, k=5, dim=8, num_planes=16, bands=8).collect()
    assert got, "LSH produced no candidates at all"
    for r in got:
        assert r.cosine == exact[(r.query_id, r.neighbor_id)]


def test_near_dup_pairs_find_planted_duplicates(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(20)]
    # plant copies: id+100 is a verbatim duplicate (cosine exactly 1.0)
    rows += [(i + 100, [float(x) for x in vecs[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    pairs = sim.embedding_near_dup_pairs(df, threshold=0.99, dim=8)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # verbatim copies share every band signature → all 20 planted pairs found
    assert {(i, i + 100) for i in range(20)} <= got


def test_arrow_topk_matches_exact_path(emb_df):
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") < 3)
    exact = sim.cosine_topk(df, queries, k=5).collect()
    fast = sim.cosine_topk_arrow(df, queries, k=5).collect()
    e = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in exact}
    f = {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in fast}
    assert set(e) == set(f)
    for key in e:
        assert e[key][0] == f[key][0]                      # same neighbors/order
        assert abs(e[key][1] - f[key][1]) < 1e-12          # ULP-level agreement


def test_ivf_topk_exact_values_on_probed_lists(emb_df):
    """IVF results re-rank probed inverted lists with the same exact cosine:
    every returned pair must carry the bit-identical brute-force value, and
    full probe coverage (n_probe == n_centroids) recovers exact top-k."""
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in sim.cosine_topk(df, queries, k=1000).collect()
    }
    got = sim.ivf_topk(df, queries, k=5, n_centroids=8, n_probe=2).collect()
    assert got
    for r in got:
        assert r.cosine == exact[(r.query_id, r.neighbor_id)]

    full = sim.ivf_topk(df, queries, k=5, n_centroids=8, n_probe=8).collect()
    brute = sim.cosine_topk(df, queries, k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id) for r in full} == {
        (r.query_id, r.rank, r.neighbor_id) for r in brute
    }


def test_ivf_broadcast_assignment_matches_literal(emb_df):
    """The two shuffle-free assignment strategies (inlined literal structs vs
    broadcast centroid-array + transform) must be bit-identical — same fold,
    same tie rule, different plan shape only."""
    df, _ = emb_df
    queries = df.filter(F.col("vec_id") < 3)

    def keyed(rows):
        return {(r.query_id, r.rank): (r.neighbor_id, r.cosine) for r in rows}

    lit_res = sim.ivf_topk(
        df, queries, k=5, n_centroids=8, n_probe=2, assign_via="literal"
    ).collect()
    bc_res = sim.ivf_topk(
        df, queries, k=5, n_centroids=8, n_probe=2, assign_via="broadcast"
    ).collect()
    assert keyed(lit_res) == keyed(bc_res)  # incl. bit-identical cosine doubles


def test_ivf_256_centroids_broadcast_matches_brute_force(spark):
    """A realistic quantizer size (256 centroids, auto → broadcast path; the
    literal path would inline 256×64 doubles into the plan) on the sf0.01
    embeddings table: full probe coverage must recover exact brute-force
    top-k bit-for-bit on a sampled query set."""
    from payroll_etl_fastapi_spark.sources.registry import load_table

    df = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    queries = df.filter(F.col("vec_id") < 5)
    got = sim.ivf_topk(df, queries, k=5, n_centroids=256, n_probe=256).collect()
    brute = sim.cosine_topk(df, queries, k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id, r.cosine) for r in got} == {
        (r.query_id, r.rank, r.neighbor_id, r.cosine) for r in brute
    }


def test_ivf_kmeans_training_deterministic_and_exact_at_full_probe(spark):
    """Lloyd training must be bit-reproducible (integer-snapped means, fixed
    tie rules) and a trained quantizer probed fully must recover brute-force
    top-k exactly — training changes the partitioning, never the ranking."""
    from payroll_etl_fastapi_spark.sources.registry import load_table

    df = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    c1 = sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)
    c2 = sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)
    assert c1 == c2  # including bit-identical centroid doubles
    assert len(c1) == 8 and all(len(v) == 64 for _, v in c1)
    # training moved at least one centroid off its init vector
    init = {r.vec_id: [float(x) for x in r.embedding]
            for r in df.filter(F.col("vec_id") < 8).collect()}
    assert any(v != init[cid] for cid, v in c1)

    queries = df.filter(F.col("vec_id") < 3)
    got = sim.ivf_topk(df, queries, k=5, n_probe=8, centroids=c1).collect()
    brute = sim.cosine_topk(df, queries, k=5).collect()
    assert {(r.query_id, r.rank, r.neighbor_id, r.cosine) for r in got} == {
        (r.query_id, r.rank, r.neighbor_id, r.cosine) for r in brute
    }


def test_arrow_topk_ignores_zero_vectors(spark):
    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.9, 0.1]), (4, [0.5, 0.5])]
    df = spark.createDataFrame(rows, SCHEMA)
    queries = df.filter(F.col("vec_id") == 2)
    got = sim.cosine_topk_arrow(df, queries, k=10).collect()
    ids = [r.neighbor_id for r in got]
    assert 1 not in ids            # zero vector dropped, not ranked first as NaN
    assert set(ids) == {3, 4}
    assert all(r.cosine == r.cosine for r in got)  # no NaNs escape


def test_cosine_topk_all_pairs_guard(emb_df):
    """The exact baseline refuses corpus x queries beyond max_pairs unless
    the caller forces it — the registry carries no unguarded all-pairs plan."""
    df, _ = emb_df
    with pytest.raises(ValueError, match="all-pairs"):
        sim.cosine_topk(df, df, 3, max_pairs=100)
    forced = sim.cosine_topk(df.limit(6), df.limit(2), 3, max_pairs=None)
    assert forced.count() > 0


# ---------------------------------------------------------------------------
# retrieval-quality floors (VERDICT r6 #1) — recall@10 vs exact, clustered
# corpus (conftest.clustered_emb). Determinism gates prove each algorithm
# runs as specified; these floors catch a change that silently destroys
# retrieval (the full knob frontier: tools/ann_recall.py + PLANS.md).
# ---------------------------------------------------------------------------

K_FLOOR = 10


def _cosine_truth(V, qids, k):
    norms = np.sqrt((V * V).sum(axis=1))
    out = {}
    for q in qids:
        cos = (V @ V[q]) / (norms * norms[q])
        order = sorted((i for i in range(len(V)) if i != q), key=lambda i: (-cos[i], i))
        out[q] = set(order[:k])
    return out


def _recall(rows, truth, k):
    by = {}
    for r in rows:
        by.setdefault(r.query_id, []).append(r.neighbor_id)
    return sum(len(set(by.get(q, [])[:k]) & t) / k for q, t in truth.items()) / len(truth)


def test_lsh_topk_recall_floor_at_defaults(spark, clustered_emb):
    """lsh_topk's documented defaults (TOPK_PLANES/TOPK_BANDS, the r7
    retrieval retune) must retrieve: measured 1.00 on this corpus (vs 0.076
    for the old 32/4 near-dup family on isotropic sf0.1 data)."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    got = sim.lsh_topk(df, queries, K_FLOOR, dim=64).collect()
    assert _recall(got, _cosine_truth(V, qids, K_FLOOR), K_FLOOR) >= 0.95


def test_ivf_topk_recall_floor_at_defaults(spark, clustered_emb):
    """ivf_topk at its gate settings (nlist=16, nprobe=4): measured 0.96."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    got = sim.ivf_topk(df, queries, K_FLOOR, n_centroids=16, n_probe=4).collect()
    assert _recall(got, _cosine_truth(V, qids, K_FLOOR), K_FLOOR) >= 0.9


def test_ivf_kmeans_recall_floor_at_defaults(spark, clustered_emb):
    """Trained-quantizer IVF at the gate settings (8 centroids, 2 Lloyd
    iterations, nprobe=2): measured 1.00 — training aligns lists with the
    true clusters, so half the probes of the data-centroid path retrieves
    more."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    cents = sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)
    got = sim.ivf_topk(df, queries, K_FLOOR, n_probe=2, centroids=cents).collect()
    assert _recall(got, _cosine_truth(V, qids, K_FLOOR), K_FLOOR) >= 0.95


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) semantic dedup
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], SCHEMA
    )


def test_incremental_semantic_decisions_and_index_growth(spark, tmp_path):
    """Snapshot 1 builds the vector index; a batch with an exact index dup, a
    near-dup of an index vector, an intra-batch near-dup and a fresh vector
    gets the right per-vector decision; the index grows append-only by one
    row per accepted vector; re-ingest admits zero."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    snap1 = _vecs(spark, [(1, (1, 0.1, 0, 0)), (2, (0.1, 1, 0, 0))])
    index = TxTable(spark, str(tmp_path / "vec_index"))
    d1 = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, snap1, cents, 0.9).collect()
    }
    assert d1[1].accepted and d1[2].accepted
    assert d1[1].cluster_id == 0 and d1[2].cluster_id == 1
    v1 = index.latest_version()
    n1 = index.snapshot().count()
    assert n1 == 2  # one row per accepted vector

    batch = _vecs(
        spark,
        [
            (10, (1, 0.1, 0, 0)),      # exact dup of 1 -> rejected vs index
            (11, (1, 0.12, 0, 0)),     # near-dup of 1 -> rejected, matched 1
            (20, (0, 1, 0.60, 0)),     # fresh (cos vs 2 ~= 0.853 < 0.9)
            (21, (0, 1, 0.62, 0)),     # intra-batch near-dup of 20 (~0.9998),
                                       # vs 2 only ~0.846
        ],
    )
    d2 = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, batch, cents, 0.9).collect()
    }
    assert not d2[10].accepted and d2[10].matched_id == 1 and d2[10].cosine > 0.999
    assert not d2[11].accepted and d2[11].matched_id == 1
    assert d2[20].accepted and d2[20].matched_id is None and d2[20].cosine is None
    assert not d2[21].accepted and d2[21].matched_id == 20
    assert index.latest_version() > v1
    assert index.snapshot().count() == n1 + 1  # only vector 20 admitted

    # re-ingesting the SAME batch admits zero vectors (self-matches at ~1.0)
    d3 = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, batch, cents, 0.9).collect()
    }
    assert all(not r.accepted for r in d3.values())
    assert d3[20].matched_id == 20 and d3[20].cosine > 0.999
    assert index.snapshot().count() == n1 + 1  # no growth on re-ingest
    assert {h["operation"] for h in index.history()} == {"append"}


def test_incremental_semantic_zero_norm_idempotent(spark, tmp_path):
    """Zero-norm carve-out (ADVICE r6): an all-zero embedding must match its
    own identical copy (cosine short-circuits to 1), so re-ingest is
    idempotent for it; a zero vector vs a DIFFERENT vector stays NULL and is
    never matched."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    index = TxTable(spark, str(tmp_path / "vec_index"))
    snap = _vecs(spark, [(1, (0, 0, 0, 0)), (2, (0.1, 1, 0, 0))])
    d1 = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, snap, cents, 0.9).collect()
    }
    # the zero vector doesn't match the non-zero one (cosine stays NULL)
    assert d1[1].accepted and d1[2].accepted
    n1 = index.snapshot().count()
    assert n1 == 2

    # re-ingest: the zero vector now self-matches at cosine exactly 1.0
    d2 = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, snap, cents, 0.9).collect()
    }
    assert not d2[1].accepted and d2[1].matched_id == 1 and d2[1].cosine == 1.0
    assert not d2[2].accepted
    assert index.snapshot().count() == n1  # no growth: idempotent

    # a second, DISTINCT zero-in-one-cluster case: zero vs different vector
    # in the same cluster is NOT a match (admitted)
    d3 = sim.incremental_semantic_dedup(
        index, _vecs(spark, [(30, (0.9, 0.1, 0.3, 0))]), cents, 0.9
    ).collect()
    assert d3[0].accepted  # cosine(zero, v) is NULL, never >= threshold


def test_incremental_semantic_greedy_rejection_chain(spark, tmp_path):
    """The semantic twin of test_dedup.test_incremental_dedup_greedy_
    rejection_chain (VERDICT r6 #4): C's only >=0.85 match is B, which was
    itself rejected via A — greedy-by-pairs still rejects C with B as
    matched_id. Geometry: A at 0°, B at 30°, C at 60° in one plane —
    cos(A,B)=cos(B,C)=0.866 >= 0.85, cos(A,C)=0.5 < 0.85; all in cluster 0."""
    import math

    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]]
    c30, s30 = math.cos(math.pi / 6), math.sin(math.pi / 6)
    c60, s60 = math.cos(math.pi / 3), math.sin(math.pi / 3)
    batch = _vecs(
        spark,
        [(1, (1, 0, 0, 0)), (2, (c30, s30, 0, 0)), (3, (c60, s60, 0, 0))],
    )
    index = TxTable(spark, str(tmp_path / "chain_idx"))
    d = {
        r.id: r
        for r in sim.incremental_semantic_dedup(index, batch, cents, 0.85).collect()
    }
    assert d[1].accepted and all(r.cluster_id == 0 for r in d.values())
    assert not d[2].accepted and d[2].matched_id == 1
    # the pinned quirk: C matched to the already-rejected B
    assert not d[3].accepted and d[3].matched_id == 2
    assert index.snapshot().count() == 1  # only A admitted


def test_incremental_semantic_cross_cluster_miss_is_by_design(spark, tmp_path):
    """Two vectors at cosine ~0.999 that straddle the cluster boundary are
    NOT matched — SemDeDup's own recall trade (comparisons are cluster-local),
    which the paired oracle replays identically."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    u = (1, 0.96, 0, 0)   # argmin L2 -> cluster 0
    w = (0.96, 1, 0, 0)   # argmin L2 -> cluster 1; cosine(u, w) ~= 0.9992
    index = TxTable(spark, str(tmp_path / "vec_index"))
    d1 = sim.incremental_semantic_dedup(
        index, _vecs(spark, [(1, u)]), cents, 0.9
    ).collect()
    assert d1[0].accepted and d1[0].cluster_id == 0
    d2 = sim.incremental_semantic_dedup(
        index, _vecs(spark, [(2, w)]), cents, 0.9
    ).collect()
    assert d2[0].accepted and d2[0].cluster_id == 1  # missed by design


def test_incremental_semantic_index_join_broadcasts_batch(spark, tmp_path, monkeypatch):
    """The 100 TB contract: the persisted index side is joined via a
    BroadcastHashJoin with the BATCH as the build side — no sort-merge join,
    no hash-partitioning of the index ever enters the plan. The r11 lazy
    checkpoint on the best-match frame would hide the join behind a Scan
    ExistingRDD in the decisions plan string, so the checkpoint is
    neutralized for this plan inspection (it never changes the join)."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    index = TxTable(spark, str(tmp_path / "vec_index"))
    sim.incremental_semantic_dedup(
        index, _vecs(spark, [(1, (1, 0.1, 0, 0)), (2, (0.1, 1, 0, 0))]), cents, 0.9
    )
    # patch the CONCRETE DataFrame class (Spark 4: pyspark.sql.DataFrame is
    # the abstract base; instances are classic.DataFrame)
    probe = _vecs(spark, [(10, (1, 0.2, 0, 0))])
    monkeypatch.setattr(
        type(probe), "localCheckpoint", lambda self, eager=True: self
    )
    decisions, _ = sim.incremental_semantic_decisions(
        index.snapshot(),
        _vecs(spark, [(10, (1, 0.2, 0, 0))]),
        cents,
        0.9,
    )
    plan = decisions._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only sort-merge join allowed is the batch-sized verdict join on
    # id; nothing may ever hash-partition on the index join key
    assert "hashpartitioning(cluster_id" not in plan


# ---------------------------------------------------------------------------
# round 8 (VERDICT r7 #2, embedding family): the sign-LSH planner is wired
# into embedding_near_dup_pairs — plan_bands=True derives (num_planes,
# bands) from the cosine threshold, calibrated against the analytic
# 1 - (1 - p^r)^B curve on a planted cosine grid.
# ---------------------------------------------------------------------------


def _planted_cosine_grid(spark, n_pairs=50, dim=64, seed=17):
    """(df, true_ids, junk_ids): unit base vectors with one planted partner
    at cosine ~0.92 (above the 0.8 plan threshold) and one at cosine ~0.3
    (junk the plan must mostly prune). Partner ids are base + 10_000 /
    + 20_000."""
    import math

    rng = np.random.default_rng(seed)

    def _pair_at(v, c):
        u = rng.normal(size=dim)
        u -= (u @ v) * v
        u /= np.linalg.norm(u)
        return c * v + math.sqrt(1 - c * c) * u

    rows = []
    for i in range(n_pairs):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 10_000, [float(x) for x in _pair_at(v, 0.92)]))
        rows.append((i + 20_000, [float(x) for x in _pair_at(v, 0.30)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    true_ids = {(i, i + 10_000) for i in range(n_pairs)}
    junk_ids = {(i, i + 20_000) for i in range(n_pairs)}
    return df, true_ids, junk_ids


def test_lsh_planes_for_pick_and_validation():
    # cosine 0.8: p = 1 - acos(0.8)/pi = 0.7952; cheapest family clearing
    # recall 0.9 at-threshold with junk mass <= 0.2 at cosine 0 is
    # 5 bits x 7 bands = 35 planes
    assert sim.lsh_planes_for(0.8) == (35, 7)
    with pytest.raises(ValueError, match="threshold"):
        sim.lsh_planes_for(1.5)
    with pytest.raises(ValueError, match="no sign-LSH family"):
        sim.lsh_planes_for(0.2, max_planes=8)


def test_near_dup_plan_bands_hits_planner_recall(spark):
    """plan_bands=True at threshold 0.8: planted cosine-0.92 partners are
    candidates with analytic probability 1-(1-p^5)^7 ~ 0.99 (p(0.92) =
    0.872), and the exact verify keeps them; cosine-0.30 junk is below the
    verify threshold regardless of banding."""
    df, true_ids, junk_ids = _planted_cosine_grid(spark)
    rows = sim.embedding_near_dup_pairs(
        df, threshold=0.8, dim=64, plan_bands=True
    ).collect()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in rows}
    assert len(got & true_ids) / len(true_ids) >= 0.9
    assert not (got & junk_ids)
    assert all(r.cosine >= 0.8 for r in rows)


def test_near_dup_plan_bands_conflict_raises(spark):
    df, _, _ = _planted_cosine_grid(spark, n_pairs=2)
    with pytest.raises(ValueError, match="not both"):
        sim.embedding_near_dup_pairs(
            df, threshold=0.8, plan_bands=True, num_planes=64, bands=16
        )


# ---------------------------------------------------------------------------
# round 8: semantic benchmark decontamination (two-table embedding near-dup)
# ---------------------------------------------------------------------------


def test_semantic_contamination_flags_planted_and_skips_clean(spark):
    """Verbatim benchmark copies of half the corpus are flagged (cosine 1.0,
    every band collides); the orthogonal-ish other half never reaches the
    0.99 threshold; output is one best-match row per contaminated id."""
    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)], SCHEMA
    )
    bench = spark.createDataFrame(
        [(i + 500, [float(x) for x in vecs[i]]) for i in range(10)],
        "bench_id long, embedding array<float>",
    )
    out = sim.semantic_contamination(corpus, bench, threshold=0.99, dim=8)
    rows = out.collect()
    got = {r.id: r.bench_id for r in rows}
    assert got == {i: i + 500 for i in range(10)}
    assert all(r.cosine >= 0.99 for r in rows)
    # one row per contaminated id even with multiple band collisions
    assert len(rows) == len(got)


def test_semantic_contamination_best_match_tiebreak(spark):
    """Two identical benchmark entries match a corpus vector at the same
    cosine — the smaller bench_id wins deterministically."""
    v = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    corpus = spark.createDataFrame([(0, v)], SCHEMA)
    bench = spark.createDataFrame(
        [(7, v), (3, v)], "bench_id long, embedding array<float>"
    )
    out = sim.semantic_contamination(corpus, bench, threshold=0.9, dim=8).collect()
    assert len(out) == 1
    assert out[0].bench_id == 3


def test_semantic_contamination_plan_bands(spark):
    """plan_bands derives the band family from the threshold (the r8
    planner contract) and still flags the verbatim planted benchmark;
    mixing plan_bands with raw knobs raises."""
    rng = np.random.default_rng(17)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], SCHEMA
    )
    bench = spark.createDataFrame(
        [(i + 900, [float(x) for x in vecs[i]]) for i in range(8)],
        "bench_id long, embedding array<float>",
    )
    got = {
        r.id: r.bench_id
        for r in sim.semantic_contamination(
            corpus, bench, threshold=0.95, dim=8, plan_bands=True
        ).collect()
    }
    assert got == {i: i + 900 for i in range(8)}
    with pytest.raises(ValueError, match="not both"):
        sim.semantic_contamination(
            corpus, bench, 0.95, dim=8, plan_bands=True, bands=2
        )


# ---------------------------------------------------------------------------
# round 8: multi-probe LSH (Lv et al. 2007) — the ann_lsh_multiprobe gate
# ---------------------------------------------------------------------------


def test_multiprobe_results_dominate_plain(spark, clustered_emb):
    """The multi-probe candidate set is a SUPERSET of the plain one (the
    base signature is probe 0), so recall@k is monotone in flips — the
    invariant that catches a band-labeling bug (a mislabeled probe row
    joins the wrong buckets and DROPS recall; found once during
    development via exactly this property). Measured here: plain 32/8 vs
    1 and 2 flips on the clustered corpus."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)

    def recall(flips):
        rows = sim.lsh_topk(
            df, queries, 10, dim=64, num_planes=32, bands=8, n_probe_flips=flips
        ).collect()
        truth = {}
        for q in qids:
            d = ((V - V[q]) ** 2).sum(axis=1)
            truth[q] = set(
                sorted((i for i in range(len(V)) if i != q), key=lambda i: (d[i], i))[:10]
            )
        by = {}
        for r in rows:
            by.setdefault(r.query_id, []).append(r.neighbor_id)
        return sum(len(set(by.get(q, [])) & truth[q]) / 10 for q in qids) / len(qids)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r0 <= r1 <= r2
    assert r2 >= 0.9  # measured 0.97+ on the clustered corpus


def test_probe_band_signatures_shape_and_flip_bits(spark):
    """Each band emits 1 + n_flips probes; probe 0 is the base signature;
    every flip differs from the base in exactly one bit; flips out of
    range raise."""
    rng = np.random.default_rng(23)
    V = rng.standard_normal((6, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(6)], SCHEMA
    )
    planes = sim.hyperplane_signs(16, 8)
    base_cols = sim.band_signatures("embedding", planes, 4)
    probe_cols = sim.probe_band_signatures("embedding", planes, 4, 2)
    row = df.select(
        *[b.alias(f"b{i}") for i, b in enumerate(base_cols)],
        *[p.alias(f"p{i}") for i, p in enumerate(probe_cols)],
    ).collect()
    for r in row:
        for band in range(4):
            probes = r[f"p{band}"]
            assert len(probes) == 3
            assert probes[0] == r[f"b{band}"]
            for flip in probes[1:]:
                diff = flip ^ r[f"b{band}"]
                assert diff != 0 and (diff & (diff - 1)) == 0  # one bit
    with pytest.raises(ValueError, match="n_flips"):
        sim.probe_band_signatures("embedding", planes, 4, 5)


# ---------------------------------------------------------------------------
# ANN planner (round 9, VERDICT r8 #1): ann_plan routes (target_recall,
# memory_budget, metric) across the committed frontier; ann_topk executes.
# ---------------------------------------------------------------------------


def test_ann_plan_pick_table():
    """The routing table, pinned like lsh_params_for's (36,9)@0.7: these
    picks ARE the planner's contract — 'at recall 0.9 use SQ8 (or
    multiprobe when you need cosine), at 0.3 use refine-over-ADC, never
    bare ADC'."""
    assert sim.ann_plan(0.9)["family"] == "sq8"
    assert sim.ann_plan(0.9, metric="cosine")["config"] == "planes=32 bands=8 flips=2"
    # at 0.85+cosine the half-index multiprobe family still beats lsh 64/16
    assert sim.ann_plan(0.85, metric="cosine")["family"] == "lsh_multiprobe"
    # 0.45+cosine: the probe-bounded flat-IVF scan (d bytes/vec) undercuts
    # the band indexes
    assert sim.ann_plan(0.45, metric="cosine")["family"] == "ivf"
    # refine-over-ADC at 0.3 — the 100 TB scan stays ~5.5 B/vec
    assert sim.ann_plan(0.3)["family"] == "ivf_pq_refined"
    # byte-budgeted asks route into the pure-code indexes
    assert sim.ann_plan(0.12, memory_budget=8)["family"] == "pq_adc"
    p = sim.ann_plan(0.11, memory_budget=16)
    assert (p["family"], p["params"]["n_probe"]) == ("ivf_pq", 4)
    p = sim.ann_plan(0.09, memory_budget=16)
    assert (p["family"], p["params"]["n_probe"]) == ("ivf_pq", 2)


def test_ann_plan_impossible_asks_raise_or_go_exact():
    with pytest.raises(ValueError, match="highest committed retrieval floor"):
        sim.ann_plan(0.95)
    with pytest.raises(ValueError, match="bytes/vector"):
        sim.ann_plan(0.9, memory_budget=32)
    exact = sim.ann_plan(0.95, allow_exact=True)
    assert exact["family"] == "exact" and exact["floor"] == 1.0
    # exact also respects the budget: raw float32 vectors cost 4*dim
    with pytest.raises(ValueError):
        sim.ann_plan(0.95, memory_budget=32, allow_exact=True)
    with pytest.raises(ValueError, match="target_recall"):
        sim.ann_plan(1.5)
    with pytest.raises(ValueError, match="metric"):
        sim.ann_plan(0.5, metric="dot")


def test_ann_plan_floors_match_committed_baseline():
    """The in-code frontier floors MUST mirror tools/quality_baseline.json
    ann_recall_floors (what quality_assert enforces) — the planner may
    never promise recall no instrument guards. Every committed floor is
    routed (no orphan contracts) and every frontier row is committed."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "quality_baseline.json"
    )
    with open(path) as fh:
        floors = json.load(fh)["ann_recall_floors"]
    frontier_keys = {}
    for c in sim.ANN_FRONTIER:
        frontier_keys[f"{c['family']}|{c['config']}"] = c["floor"]
    assert frontier_keys == floors
    # dedup-shape floors (VERDICT r10 #4) mirror the same way: every row
    # carrying a dedup_floor is committed in semantic_dedup_pair_floors and
    # vice versa — shape="dedup" may never promise an unguarded recall
    with open(path) as fh:
        dedup_floors = json.load(fh)["semantic_dedup_pair_floors"]
    frontier_dedup = {
        f"{c['family']}|{c['config']}": c["dedup_floor"]
        for c in sim.ANN_FRONTIER
        if "dedup_floor" in c
    }
    assert frontier_dedup == dedup_floors


def test_ann_plan_dedup_shape_picks_and_raises():
    """shape="dedup" qualifies on the PAIR-recall floors: 0.85 at cosine
    routes to multiprobe (pair floor 0.95, cheapest scan), 0.45 routes to
    the trained-kmeans IVF (pair floor 0.75 — under retrieval floors it
    did not even qualify), quantizer families never qualify (no dedup
    dispatch), and an ask above 0.95 raises naming the dedup ceiling."""
    p = sim.ann_plan(0.85, metric="cosine", shape="dedup")
    assert p["family"] == "lsh_multiprobe" and p["floor"] == 0.97
    assert p["shape"] == "dedup"
    p2 = sim.ann_plan(0.45, metric="cosine", shape="dedup")
    assert p2["family"] == "ivf_kmeans" and p2["floor"] == 0.75
    # retrieval shape at the same ask still picks the retrieval frontier
    assert sim.ann_plan(0.45, metric="cosine", shape="retrieval")["family"] == "ivf"
    with pytest.raises(ValueError, match="dedup.*0.97"):
        sim.ann_plan(0.98, metric="cosine", shape="dedup")
    with pytest.raises(ValueError, match="shape"):
        sim.ann_plan(0.5, shape="bogus")
    # no metric filter: l2 rows carry no dedup_floor, so they never win
    assert sim.ann_plan(0.9, shape="dedup")["family"] in ("lsh", "lsh_multiprobe")


def test_ann_topk_routed_sq8_meets_target_on_clustered(spark, clustered_emb):
    """End-to-end: target 0.9 routes to SQ8; retrieval on the clustered
    corpus clears the target against metric-matched (L2) truth."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    got = sim.ann_topk(df, queries, K_FLOOR, target_recall=0.9).collect()
    truth = {}
    for q in qids:
        d2 = ((V - V[q]) ** 2).sum(axis=1)
        order = sorted((i for i in range(len(V)) if i != q), key=lambda i: (d2[i], i))
        truth[q] = set(order[:K_FLOOR])
    assert _recall(got, truth, K_FLOOR) >= 0.9
    assert {c for c in sim.ann_topk(
        df, queries, K_FLOOR, target_recall=0.9
    ).columns} == {"query_id", "neighbor_id", "rank"}


def test_ann_topk_routed_cosine_pick_meets_target(spark, clustered_emb):
    """target 0.9 + metric=cosine routes to multiprobe 32/8-f2 and clears
    the target against cosine truth."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    got = sim.ann_topk(
        df, queries, K_FLOOR, target_recall=0.9, metric="cosine"
    ).collect()
    assert _recall(got, _cosine_truth(V, qids, K_FLOOR), K_FLOOR) >= 0.9


def test_ann_topk_exact_fallback_is_exact(spark, emb_df):
    df, vecs = emb_df
    queries = df.filter(F.col("vec_id") < 3)
    got = sim.ann_topk(
        df, queries, 5, target_recall=1.0, metric="cosine", allow_exact=True
    ).collect()
    want = _numpy_topk(vecs, [0, 1, 2], 5)
    by = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by.setdefault(r.query_id, []).append(r.neighbor_id)
    assert by == want


def test_ann_topk_routed_refined_dispatch_and_floor(spark, clustered_emb):
    """target 0.3 routes to ivf_pq_refined — the full dispatch (kmeans
    coarse training, residual codebooks, refine tail) runs end-to-end and
    the clustered-corpus recall clears the committed floor with room (the
    refine tail measured >=0.95 here in r8)."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    p = sim.ann_plan(0.3)
    assert p["family"] == "ivf_pq_refined"
    got = sim.ann_topk(df, queries, K_FLOOR, target_recall=0.3, plan=p).collect()
    truth = {}
    for q in qids:
        d2 = ((V - V[q]) ** 2).sum(axis=1)
        order = sorted((i for i in range(len(V)) if i != q), key=lambda i: (d2[i], i))
        truth[q] = set(order[:K_FLOOR])
    assert _recall(got, truth, K_FLOOR) >= 0.9
