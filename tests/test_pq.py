"""Tests for operators.pq: encode == numpy argmin, trained codebooks ==
an exact python replica of the snapped Lloyd steps, and ADC retrieves the
true nearest cluster on separated data."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import pq as PQ


def _frame(spark, X):
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_encode_matches_numpy_argmin(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 8))
    books = PQ.pq_codebooks_random(m=2, k=4, dim=8, seed=5)
    out = {r.id: (r.c0, r.c1) for r in PQ.pq_encode(_frame(spark, X), books).collect()}
    for i in range(60):
        for j, book in enumerate(books):
            block = X[i, j * 4 : (j + 1) * 4]
            dists = [float(np.sum((block - np.array(c)) ** 2)) for c in book]
            exp = int(np.argmin(dists))  # numpy argmin = first min = small code
            assert out[i][j] == exp, (i, j)


def test_trained_codebooks_match_python_replica(spark):
    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 8))
    df = _frame(spark, X)
    got = PQ.pq_train_codebooks(df, m=2, k=3, dim=8, n_iters=2)

    books = [[list(X[r, j * 4 : (j + 1) * 4]) for r in range(3)] for j in range(2)]
    for _ in range(2):
        for j in range(2):
            block = X[:, j * 4 : (j + 1) * 4]
            codes = []
            for row in block:
                dists = [sum((row[d] - c[d]) ** 2 for d in range(4)) for c in books[j]]
                codes.append(dists.index(min(dists)))
            new = []
            for ci in range(3):
                members = [r for r, c in enumerate(codes) if c == ci]
                if not members:
                    new.append(books[j][ci])
                    continue
                cent = []
                for d in range(4):
                    s = sum(
                        math.floor(block[r, d] * PQ.SNAP + 0.5) for r in members
                    )
                    cent.append(float(s) / len(members) / float(PQ.SNAP))
                new.append(cent)
            books[j] = new
    for j in range(2):
        for ci in range(3):
            assert got[j][ci] == pytest.approx(books[j][ci], abs=0), (j, ci)


def test_adc_finds_the_true_cluster(spark):
    # three well-separated clusters; ADC top-1 for a query must come from
    # the query's own cluster
    rng = np.random.default_rng(21)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [0.0] * 8])
    X = np.vstack([c + rng.normal(scale=0.1, size=(20, 8)) for c in centers])
    df = _frame(spark, X)
    books = PQ.pq_train_codebooks(df, m=2, k=4, dim=8, n_iters=2)
    queries = df.filter(F.col("vec_id").isin(0, 20, 40))
    out = PQ.pq_adc_topk(df, queries, books, k=3).collect()
    for r in out:
        assert r.neighbor_id // 20 == r.query_id // 20, (
            r.query_id,
            r.neighbor_id,
        )


def test_ivf_pq_zero_centroid_equals_plain_pq(spark):
    # one inverted list whose centroid is the origin: residual == vector,
    # probe always hits the single list -> IVF-PQ must equal plain PQ-ADC
    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 8))
    df = _frame(spark, X)
    books = PQ.pq_codebooks_random(m=2, k=4, dim=8, seed=5)
    queries = df.filter(F.col("vec_id") < 3)
    plain = PQ.pq_adc_topk(df, queries, books, k=4).collect()
    ivf = PQ.ivf_pq_topk(
        df, queries, [[0.0] * 8], books, k=4, n_probe=1
    ).collect()
    key = lambda rs: sorted((r.query_id, r.neighbor_id, r.adc_micros, r.rank) for r in rs)
    assert key(ivf) == key(plain)


def test_ivf_pq_assignment_spreads_and_probe_restricts(spark):
    rng = np.random.default_rng(12)
    # two well-separated clusters around +/-5; centroids at the cluster means
    X = np.concatenate(
        [rng.normal(5, 0.1, size=(20, 8)), rng.normal(-5, 0.1, size=(20, 8))]
    )
    df = _frame(spark, X)
    cents = [[5.0] * 8, [-5.0] * 8]
    books = PQ.pq_codebooks_random(m=2, k=4, dim=8, seed=5)
    queries = df.filter(F.col("vec_id") == 0)  # in the +5 cluster
    out = PQ.ivf_pq_topk(df, queries, cents, books, k=40, n_probe=1).collect()
    # n_probe=1 from a +5-cluster query: candidates only from list 0
    assert out, "no candidates returned"
    assert {r.neighbor_id for r in out} <= set(range(1, 20))
    # probing both lists reaches the other cluster too
    out2 = PQ.ivf_pq_topk(df, queries, cents, books, k=40, n_probe=2).collect()
    assert {r.neighbor_id for r in out2} == set(range(1, 40))


def test_pq_encode_keep_carries_columns(spark):
    rng = np.random.default_rng(13)
    X = rng.normal(size=(10, 8))
    df = _frame(spark, X).withColumn("tag", F.col("vec_id") * 2)
    books = PQ.pq_codebooks_random(m=2, k=4, dim=8, seed=5)
    out = PQ.pq_encode(df, books, keep=("tag",)).collect()
    assert all(r.tag == r.id * 2 for r in out)


# ---------------------------------------------------------------------------
# retrieval-quality floors (VERDICT r6 #1) — recall@10 vs exact float64 L2
# truth (the metric ADC approximates), clustered corpus. The gate configs
# (random codebooks) are determinism demos, near-zero recall by construction
# (measured 0.02 at sf0.1, tools/ann_recall.py) — the floors pin the TRAINED
# quality path.
# ---------------------------------------------------------------------------


def _l2_truth(V, qids, k):
    out = {}
    for q in qids:
        d2 = ((V - V[q]) ** 2).sum(axis=1)
        order = sorted((i for i in range(len(V)) if i != q), key=lambda i: (d2[i], i))
        out[q] = set(order[:k])
    return out


def _recall(rows, truth, k):
    by = {}
    for r in rows:
        by.setdefault(r.query_id, []).append(r.neighbor_id)
    return sum(len(set(by.get(q, [])[:k]) & t) / k for q, t in truth.items()) / len(truth)


def test_pq_adc_trained_recall_floor(spark, clustered_emb):
    """Trained PQ (m=8 blocks × 16 codes = 32 bits/vector) on the clustered
    corpus: measured 0.38 — PQ retrieves the CLUSTER but 32-bit codes cannot
    resolve fine within-cluster ranking; the floor catches a change that
    drops it to noise (~0.03 = 10/299 by chance)."""
    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    books = PQ.pq_train_codebooks(df, 8, 16, 64, n_iters=2)
    got = PQ.pq_adc_topk(df, queries, books, 10).collect()
    assert _recall(got, _l2_truth(V, qids, 10), 10) >= 0.3


def test_ivf_pq_trained_recall_floor(spark, clustered_emb):
    """Trained coarse quantizer (kmeans, 8 lists) + trained books, nprobe=2:
    measured 0.43. Residual coding beats raw-vector PQ at equal bit budget
    here, and the floor pins that the composed path retrieves above the
    plain-PQ one."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    cents = [c for _, c in sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)]
    books = PQ.pq_train_codebooks(df, 8, 16, 64, n_iters=2)
    got = PQ.ivf_pq_topk(df, queries, cents, books, 10, n_probe=2).collect()
    assert _recall(got, _l2_truth(V, qids, 10), 10) >= 0.38


def test_ivf_residuals_reconstruct_and_match_topk_assignment(spark):
    """ivf_residuals: res + assigned centroid == the original vector (exact
    doubles), and the (id, list_id) assignment is identical to what
    ivf_pq_topk computes internally (same broadcast fold-argmin)."""
    rng = np.random.default_rng(21)
    X = np.concatenate(
        [rng.normal(3, 0.2, size=(10, 8)), rng.normal(-3, 0.2, size=(10, 8))]
    )
    df = _frame(spark, X)
    cents = [[3.0] * 8, [-3.0] * 8]
    out = PQ.ivf_residuals(df, cents).collect()
    assert len(out) == 20
    for r in out:
        want_list = 0 if r.vec_id < 10 else 1
        assert r.list_id == want_list
        rebuilt = [v + c for v, c in zip(r.res, cents[r.list_id])]
        orig = [float(x) for x in X[r.vec_id]]
        # exact: (a - c) + c over doubles with |a - c| << c reconstructs a
        assert rebuilt == pytest.approx(orig, abs=0)


def test_ivf_pq_residual_trained_books_recall(spark, clustered_emb):
    """FAISS-style residual codebook training (ivf_residuals →
    pq_train_codebooks on the residual frame): measured 0.44 vs 0.43 for
    raw-trained books on this corpus — marginal HERE because within-cluster
    residuals are isotropic noise (the bit budget binds), but the path is
    the production one and must stay at least as good as raw training."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    cents = [c for _, c in sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)]
    res_frame = PQ.ivf_residuals(df, cents).localCheckpoint()
    books = PQ.pq_train_codebooks(res_frame, 8, 16, 64, n_iters=2, vec_col="res")
    got = PQ.ivf_pq_topk(df, queries, cents, books, 10, n_probe=2).collect()
    assert _recall(got, _l2_truth(V, qids, 10), 10) >= 0.4


# ---------------------------------------------------------------------------
# round 8 (VERDICT r7 #1): the random-codebook configs the driver gates used
# through r7 are DEMOTED to these determinism tests — they retrieve at
# recall@10 ~0.02 (frontier, PLANS.md §ANN recall) but replay bit-exactly in
# SQL, which is the property they pin. The driver gates now run the TRAINED
# configs (suite_similarity._pq_trained_adc_oracle / _ivf_pq_trained_oracle).
# ---------------------------------------------------------------------------


def _duck_embeddings(sf_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    return con


def _testdata_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_random_book_adc_matches_duckdb_oracle(spark):
    from payroll_etl_fastapi_spark.plans.suite_similarity import DIM, _pq_oracle
    from tests.conftest import SF_SMALL

    emb = _testdata_emb(spark, SF_SMALL)
    books = PQ.pq_codebooks_random(4, 8, DIM)
    queries = emb.filter(F.col("vec_id") < 8)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.pq_adc_topk(emb, queries, books, k=5).collect()
    }
    con = _duck_embeddings(SF_SMALL)
    exp = {(q, rk): (n, d) for q, n, d, rk in con.sql(_pq_oracle()).fetchall()}
    assert got == exp


def test_random_book_ivf_pq_matches_duckdb_oracle(spark):
    from payroll_etl_fastapi_spark.plans.suite_similarity import (
        DIM,
        _ivf_pq_oracle,
    )
    from tests.conftest import SF_SMALL

    emb = _testdata_emb(spark, SF_SMALL)
    cents = PQ.ivf_centroids_random(8, DIM)
    books = PQ.pq_codebooks_random(4, 8, DIM)
    queries = emb.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.ivf_pq_topk(emb, queries, cents, books, k=5, n_probe=2).collect()
    }
    con = _duck_embeddings(SF_SMALL)
    exp = {(q, rk): (n, d) for q, n, d, rk in con.sql(_ivf_pq_oracle()).fetchall()}
    assert got == exp


def test_snap_constants_shared():
    """The SQL training replay (suite_similarity._sql_pq_train_ctes) inlines
    similarity.SNAP; the engine trainer snaps with pq.SNAP — they must be
    the same constant or the replayed books silently diverge."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    assert PQ.SNAP == sim.SNAP == (1 << 20)


def test_l2_topk_matches_numpy_and_guards(spark):
    """similarity.l2_topk is the metric-matched exact baseline for the ADC
    rankers (ann_pq_recall gate): squared-L2 ranking must equal numpy truth,
    ties break toward the smaller neighbor_id, and the all-pairs guard
    refuses oversized plans."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    X = rng.normal(size=(40, 8))
    df = _frame(spark, X)
    queries = df.filter(F.col("vec_id") < 4)
    got = {}
    for r in sim.l2_topk(df, queries, 5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    truth = _l2_truth(X, [0, 1, 2, 3], 5)
    for q in range(4):
        ids = [n for _, n in sorted(got[q])]
        assert set(ids) == truth[q], q
    with pytest.raises(ValueError, match="brute-force all-pairs"):
        sim.l2_topk(df, queries, 5, max_pairs=10).collect()


def test_pack_unpack_roundtrip_and_packed_search_parity(spark):
    """round 8: the byte-packed storage format (pq_pack_codes /
    pq_adc_topk_packed) — pack→unpack is the identity on codes, the binary
    column is exactly m bytes, and packed search ranks identically to
    pq_adc_topk on the same codes."""
    rng = np.random.default_rng(23)
    X = rng.normal(size=(60, 16))
    df = _frame(spark, X)
    books = PQ.pq_train_codebooks(df, m=4, k=8, dim=16, n_iters=2)
    codes = PQ.pq_encode(df, books)
    packed = PQ.pq_pack_codes(codes, m=4)
    rows = packed.collect()
    assert all(len(r.code) == 4 for r in rows)
    back = {
        r.id: (r.c0, r.c1, r.c2, r.c3)
        for r in PQ.pq_unpack_codes(packed, m=4).collect()
    }
    orig = {r.id: (r.c0, r.c1, r.c2, r.c3) for r in codes.collect()}
    assert back == orig
    queries = df.filter(F.col("vec_id") < 3)
    plain = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.pq_adc_topk(df, queries, books, k=5).collect()
    }
    via_packed = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.pq_adc_topk_packed(packed, queries, books, k=5).collect()
    }
    assert via_packed == plain


def test_packed_code_handles_high_codes(spark):
    """codes >= 16 need the zero-padded two-hex-digit window (hex(255) =
    'FF', hex(5) = '5' unpadded) — pin the boundary bytes."""
    codes = spark.createDataFrame(
        [(1, 0, 255, 16, 9)], "id long, c0 int, c1 int, c2 int, c3 int"
    )
    packed = PQ.pq_pack_codes(codes, m=4).collect()[0]
    assert packed.code.hex().upper() == "00FF1009"
    back = PQ.pq_unpack_codes(PQ.pq_pack_codes(codes, m=4), m=4).collect()[0]
    assert (back.c0, back.c1, back.c2, back.c3) == (0, 255, 16, 9)


def test_ivf_pq_packed_index_parity(spark):
    """round 8: the complete FAISS stored-index row (ivf_pq_encode_packed:
    id + list_id + m residual-code bytes) searched via ivf_pq_topk_packed
    must rank identically to ivf_pq_topk on the raw vectors."""
    rng = np.random.default_rng(31)
    X = np.concatenate(
        [rng.normal(3, 0.5, size=(15, 8)), rng.normal(-3, 0.5, size=(15, 8))]
    )
    df = _frame(spark, X)
    cents = [[3.0] * 8, [-3.0] * 8]
    books = PQ.pq_train_codebooks(
        PQ.ivf_residuals(df, cents), m=2, k=4, dim=8, n_iters=2, vec_col="res"
    )
    packed = PQ.ivf_pq_encode_packed(df, cents, books)
    rows = packed.collect()
    assert {len(r.code) for r in rows} == {2}
    assert {r.list_id for r in rows} == {0, 1}
    queries = df.filter(F.col("vec_id") < 3)
    plain = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.ivf_pq_topk(df, queries, cents, books, k=5, n_probe=1).collect()
    }
    via_packed = {
        (r.query_id, r.rank): (r.neighbor_id, r.adc_micros)
        for r in PQ.ivf_pq_topk_packed(
            packed, queries, cents, books, k=5, n_probe=1
        ).collect()
    }
    assert via_packed == plain


# ---------------------------------------------------------------------------
# round 8: exact-re-rank refinement (FAISS IndexRefineFlat shape) — the
# ann_pq_refine gate's operator. Recall becomes "did the true neighbor make
# the shortlist"; on the clustered corpus every cluster-mate does.
# ---------------------------------------------------------------------------


def test_refine_topk_matches_numpy_rerank(spark):
    """similarity.refine_topk over an ARBITRARY shortlist: per query, the k
    exact-L2-smallest shortlist members, micro-snapped, ties (micros, id) —
    verified against a float64 numpy replay including the snap."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    X = rng.standard_normal((30, 8))
    df = _frame(spark, X)
    queries = df.filter(F.col("vec_id") < 3)
    # shortlist: a fixed pseudo-random 8-candidate set per query
    pairs = [(q, int(n)) for q in range(3) for n in rng.choice(30, 8, replace=False)]
    short = spark.createDataFrame(pairs, "query_id long, neighbor_id long")
    got = sim.refine_topk(df, short, queries, k=4).collect()

    def fold_l2(a, b):  # the operator's sequential left fold, replayed
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    for q in range(3):
        cand = [n for qq, n in pairs if qq == q]
        micros = {
            n: int(math.floor(fold_l2(X[n], X[q]) * 1_000_000 + 0.5))
            for n in cand
        }
        want = sorted(cand, key=lambda n: (micros[n], n))[:4]
        got_q = sorted(
            (r for r in got if r.query_id == q), key=lambda r: r.rank
        )
        assert [r.neighbor_id for r in got_q] == want
        assert [r.l2_micros for r in got_q] == [micros[n] for n in want]


def test_refine_recall_floor_and_dominance(spark, clustered_emb):
    """Refined IVF-PQ (k*4 shortlist, exact re-rank) on the clustered
    corpus: measured base 0.44 -> refined 1.00 recall@10 — every true
    neighbor is a cluster-mate, lands in the probed lists' shortlist, and
    the exact re-rank recovers it. Floors: refined >= 0.95 and never below
    base (driver-scale lift: 0.44 -> 0.82 at sf0.01, the ann_pq_refine
    gate's own rows)."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    df, V, qids = clustered_emb
    queries = df.filter(F.col("vec_id") % 30 == 0)
    cents = [c for _, c in sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)]
    res_frame = PQ.ivf_residuals(df, cents).localCheckpoint()
    books = PQ.pq_train_codebooks(res_frame, 8, 16, 64, n_iters=2, vec_col="res")
    truth = _l2_truth(V, qids, 10)
    base = PQ.ivf_pq_topk(df, queries, cents, books, 10, n_probe=2).collect()
    ref = PQ.ivf_pq_topk_refined(
        df, queries, cents, books, 10, n_probe=2, refine_mult=4
    ).collect()
    rb, rr = _recall(base, truth, 10), _recall(ref, truth, 10)
    assert rr >= 0.95
    assert rr >= rb


def test_refine_full_shortlist_equals_exact(spark):
    """When every list is probed and the shortlist covers the whole corpus,
    the refined ranking IS the exact l2_topk ranking — quantization cannot
    lose a candidate it only re-orders."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    X = rng.standard_normal((20, 8))
    df = _frame(spark, X)
    cents = [[1.0] * 8, [-1.0] * 8]
    books = PQ.pq_train_codebooks(
        PQ.ivf_residuals(df, cents), m=2, k=4, dim=8, n_iters=2, vec_col="res"
    )
    queries = df.filter(F.col("vec_id") < 3)
    ref = PQ.ivf_pq_topk_refined(
        df, queries, cents, books, k=5, n_probe=2, refine_mult=4
    ).collect()
    exact = sim.l2_topk(df, queries, k=5).collect()
    want = {(r.query_id, r.rank): r.neighbor_id for r in exact}
    got = {(r.query_id, r.rank): r.neighbor_id for r in ref}
    assert got == want


# ---------------------------------------------------------------------------
# round 8: SQ8 scalar quantization (the ann_sq8_topk gate's operators)
# ---------------------------------------------------------------------------


def test_sq8_reconstruction_error_within_half_step(spark):
    """Decode error per dimension is bounded by half a quantization step
    (span/510); a constant dimension (span 0) decodes to exactly lo."""
    rng = np.random.default_rng(5)
    X = rng.standard_normal((50, 8))
    X[:, 3] = 2.5  # degenerate dimension
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    bounds = PQ.sq8_train_bounds(df, 8)
    assert bounds[3][0] == bounds[3][1]
    packed = PQ.sq8_encode_packed(df, bounds)
    # decode via the search path's expression: run sq8_topk with the row
    # itself as query — d_micros of the self-free nearest reflects decode,
    # so instead decode directly through unpack + python
    rows = {r.id: bytes(r.code) for r in packed.collect()}
    Xf = X.astype(np.float32).astype(np.float64)
    for i, code in rows.items():
        for d, (lo, hi) in enumerate(bounds):
            dec = lo + (code[d] * (hi - lo)) / 255.0
            if hi == lo:
                assert code[d] == 0 and dec == lo
            else:
                assert abs(dec - Xf[i][d]) <= (hi - lo) / 510.0 + 1e-12


def test_sq8_train_bounds_rejects_empty_corpus(spark):
    """min/max over zero rows is NULL everywhere — raise a clear error
    instead of a TypeError from float(None) (ADVICE r8)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        PQ.sq8_train_bounds(empty, 4)


def test_sq8_recall_floor_on_clustered_corpus(spark, clustered_emb):
    """SQ8 at 64 bytes/vector: measured 0.97 recall@10 on the clustered
    corpus (vs 0.44 for 8-byte IVF-PQ) — the storage-compression endpoint
    of the quantization frontier retrieves near-exactly."""
    df, V, qids = clustered_emb
    bounds = PQ.sq8_train_bounds(df, 64)
    packed = PQ.sq8_encode_packed(df, bounds)
    queries = df.filter(F.col("vec_id") % 30 == 0)
    got = PQ.sq8_topk(packed, queries, bounds, 10).collect()
    out = [r for r in got]
    # rows carry neighbor_id; reuse the file's recall helper
    assert _recall(out, _l2_truth(V, qids, 10), 10) >= 0.9


def test_ivf_sq8_probe_restricts_and_full_probe_equals_flat(spark, clustered_emb):
    """IVF-SQ8: with every list probed the ranking equals flat sq8_topk
    (the IVF layer only restricts, never re-scores); with 2 of 8 probes
    the clustered corpus still retrieves near-exactly (measured 0.97 —
    cluster-mates share lists)."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    df, V, qids = clustered_emb
    cents = [c for _, c in sim.train_centroids_kmeans(df, n_centroids=8, n_iters=2)]
    bounds = PQ.sq8_train_bounds(df, 64)
    packed = PQ.ivf_sq8_encode_packed(df, cents, bounds)
    queries = df.filter(F.col("vec_id") % 30 == 0)
    full = PQ.ivf_sq8_topk(packed, queries, cents, bounds, 10, n_probe=8).collect()
    flat = PQ.sq8_topk(
        PQ.sq8_encode_packed(df, bounds), queries, bounds, 10
    ).collect()
    key = lambda rs: sorted((r.query_id, r.rank, r.neighbor_id, r.d_micros) for r in rs)  # noqa: E731
    assert key(full) == key(flat)
    probed = PQ.ivf_sq8_topk(packed, queries, cents, bounds, 10, n_probe=2).collect()
    assert _recall(probed, _l2_truth(V, qids, 10), 10) >= 0.9
