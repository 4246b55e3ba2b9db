"""ANN retrieval-quality harness (VERDICT r6 #1): recall@k of every
approximate-nearest-neighbor operator against the exact baseline, swept over
each method's quality knob, with wall-clock per configuration — the
recall/latency frontier the determinism gates cannot see.

Why this exists: the driver's oracle gates prove each ANN operator runs its
algorithm EXACTLY as specified (bit-identical to a DuckDB replay) — which
says nothing about whether that specification retrieves the true neighbors.
A hashing change that silently destroys retrieval quality would pass every
existing gate. This harness measures quality directly:

  recall@k(method) = mean over queries of
      |method's top-k  ∩  exact top-k| / k

Ground truth is metric-matched per method family:
- cosine-ranking methods (lsh_topk, ivf_topk, ivf_kmeans) score against the
  ENGINE's own exact baseline `cosine_topk` (operators/similarity.py:133) —
  the same fold-ordered cosine, so ties can't diverge;
- L2/ADC-ranking methods (pq_adc_topk, ivf_pq_topk approximate squared-L2
  via quantized codes) score against an exact float64 L2 top-k (numpy,
  driver-side — the corpus is driver-tiny at harness scale). Scoring an L2
  method against cosine truth would conflate quantization loss with the
  metric mismatch.

A method returning fewer than k rows for a query (candidate starvation —
LSH with too few bands, IVF probing empty lists) counts the missing slots
as misses: starvation IS a recall failure.

Latency per configuration is min-of-2 interleaved passes (same estimator as
bench.py) of build+collect wall time.

Output: a markdown frontier table on stdout + `.ann_recall.json` at the repo
root. The per-default-config floors are pytest-pinned in
tests/test_similarity.py / tests/test_pq.py (clustered corpus, fixed seed).

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
       (default /root/testdata/sf0.1, 100 queries, k=10)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from payroll_etl_fastapi_spark.operators import pq as PQ  # noqa: E402
from payroll_etl_fastapi_spark.operators import similarity as sim  # noqa: E402
from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
K = 10
DIM = 64
PASSES = 2


def recall_at_k(got_rows, truth: dict[int, set[int]], k: int) -> float:
    """Mean over truth's queries of |top-k ∩ truth| / k; queries the method
    returned nothing for score 0 (starvation = recall failure)."""
    by_q: dict[int, list[int]] = {}
    for r in got_rows:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    total = 0.0
    for q, t in truth.items():
        total += len(set(by_q.get(q, [])[:k]) & t) / k
    return total / len(truth)


def l2_truth(ids: np.ndarray, V: np.ndarray, qids: list[int], k: int) -> dict[int, set[int]]:
    """Exact float64 squared-L2 top-k (ties → smaller id), self excluded."""
    out: dict[int, set[int]] = {}
    pos = {int(v): i for i, v in enumerate(ids)}
    for q in qids:
        diff = V - V[pos[q]]
        d2 = (diff * diff).sum(axis=1)
        order = sorted(
            (i for i in range(len(V)) if int(ids[i]) != q),
            key=lambda i: (d2[i], int(ids[i])),
        )
        out[q] = {int(ids[i]) for i in order[:k]}
    return out


def main() -> None:
    spark = get_spark("ann_recall")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    qids = [r.vec_id for r in queries.select("vec_id").collect()]

    # ---- ground truths -----------------------------------------------------
    t0 = time.perf_counter()
    exact_rows = sim.cosine_topk(emb, queries, K, max_pairs=None).collect()
    exact_secs = time.perf_counter() - t0
    cos_truth: dict[int, set[int]] = {}
    for r in exact_rows:
        cos_truth.setdefault(r.query_id, set()).add(r.neighbor_id)

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    l2t = l2_truth(ids, V, qids, K)

    results: list[dict] = []

    def run(family: str, label: str, truth: dict[int, set[int]], fn) -> None:
        best, rec = None, None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            got = fn().collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            rec = recall_at_k(got, truth, K)
        results.append(
            {"family": family, "config": label, "recall_at_10": round(rec, 4),
             "secs": round(best, 3)}
        )
        print(f"  {family:10s} {label:34s} recall@{K}={rec:.3f}  {best:6.2f}s",
              file=sys.stderr)

    # ---- LSH: knob = (planes, bands) --------------------------------------
    for planes, bands in [(32, 2), (32, 4), (32, 8), (64, 8), (64, 16), (96, 16), (128, 16)]:
        dflt = " *default*" if (planes, bands) == (sim.TOPK_PLANES, sim.TOPK_BANDS) else ""
        run("lsh", f"planes={planes} bands={bands}{dflt}", cos_truth,
            lambda p=planes, b=bands: sim.lsh_topk(
                emb, queries, K, dim=DIM, num_planes=p, bands=b))

    # ---- IVF (lowest-id data centroids): knob = n_probe -------------------
    for n_probe in [1, 2, 4, 8, 16]:
        dflt = " *default*" if n_probe == 4 else ""
        run("ivf", f"nlist=16 nprobe={n_probe}{dflt}", cos_truth,
            lambda np_=n_probe: sim.ivf_topk(
                emb, queries, K, n_centroids=16, n_probe=np_))

    # ---- IVF with trained k-means quantizer: knob = n_probe ---------------
    cents = sim.train_centroids_kmeans(emb, n_centroids=8, n_iters=2)
    for n_probe in [1, 2, 4, 8]:
        dflt = " *default*" if n_probe == 2 else ""
        run("ivf_kmeans", f"nlist=8(t) nprobe={n_probe}{dflt}", cos_truth,
            lambda np_=n_probe: sim.ivf_topk(
                emb, queries, K, n_probe=np_, centroids=cents))

    # ---- PQ-ADC: knobs = (m blocks, k codes), random vs trained books -----
    for m, kc, trained in [
        (4, 8, False), (8, 16, False),
        (4, 8, True), (8, 16, True), (16, 16, True), (8, 64, True),
    ]:
        books = (
            PQ.pq_train_codebooks(emb, m, kc, DIM, n_iters=2)
            if trained
            else PQ.pq_codebooks_random(m, kc, DIM)
        )
        src = "trained" if trained else "random"
        # r8: the driver gate trains m=8/k=16 on raw vectors (ann_pq_adc_topk)
        dflt = " *default*" if (m, kc, trained) == (8, 16, True) else ""
        run("pq_adc", f"m={m} k={kc} {src}{dflt}", l2t,
            lambda b=books: PQ.pq_adc_topk(emb, queries, b, K))

    # ---- IVF-PQ: knob = n_probe (gate books/cents) -------------------------
    g_cents = PQ.ivf_centroids_random(8, DIM)
    g_books = PQ.pq_codebooks_random(4, 8, DIM)
    t_books = PQ.pq_train_codebooks(emb, 4, 8, DIM, n_iters=2)
    for n_probe in [1, 2, 4, 8]:
        run("ivf_pq", f"nlist=8 m=4 k=8 rnd nprobe={n_probe}", l2t,
            lambda np_=n_probe: PQ.ivf_pq_topk(
                emb, queries, g_cents, g_books, K, n_probe=np_))
    for n_probe in [2, 8]:
        run("ivf_pq", f"nlist=8 m=4 k=8 trained nprobe={n_probe}", l2t,
            lambda np_=n_probe: PQ.ivf_pq_topk(
                emb, queries, g_cents, t_books, K, n_probe=np_))
    # trained coarse quantizer (the production path) + trained books;
    # books are trained on raw vectors, not residuals — noted in PLANS.md
    km_cents = [c for _, c in sim.train_centroids_kmeans(emb, n_centroids=8, n_iters=2)]
    t_books2 = PQ.pq_train_codebooks(emb, 8, 16, DIM, n_iters=2)
    for n_probe in [2, 4, 8]:
        run("ivf_pq", f"nlist=8(t) m=8 k=16 trained nprobe={n_probe}", l2t,
            lambda np_=n_probe: PQ.ivf_pq_topk(
                emb, queries, km_cents, t_books2, K, n_probe=np_))
    # FAISS-style residual-trained books (ivf_residuals → pq_train_codebooks)
    r_frame = PQ.ivf_residuals(emb, km_cents).localCheckpoint()
    r_books = PQ.pq_train_codebooks(r_frame, 8, 16, DIM, n_iters=2, vec_col="res")
    # r8: nprobe=2 is the ann_ivf_pq_topk gate config, nprobe=4 the
    # ann_pq_recall gate config
    for n_probe in [2, 4, 8]:
        dflt = " *default*" if n_probe == 2 else ""
        run("ivf_pq", f"nlist=8(t) m=8 k=16 RESID-trained nprobe={n_probe}{dflt}", l2t,
            lambda np_=n_probe: PQ.ivf_pq_topk(
                emb, queries, km_cents, r_books, K, n_probe=np_))
    # r8: multi-probe LSH (Lv et al. 2007) — recall from query-side probes
    # instead of more stored hash tables; 32/8 at 2 flips is the
    # ann_lsh_multiprobe gate config (half the 64/16 family's band rows)
    for flips in [0, 1, 2, 3]:
        dflt = " *gate*" if flips == 2 else ""
        run("lsh_multiprobe", f"planes=32 bands=8 flips={flips}{dflt}", cos_truth,
            lambda f=flips: sim.lsh_topk(
                emb, queries, K, dim=DIM, num_planes=32, bands=8,
                n_probe_flips=f))
    # r8: SQ8 scalar quantization (byte per dimension) — the storage-
    # compression endpoint of the frontier: near-exact recall at 4x
    # scan-width cut; the ann_sq8_topk gate config.
    sq8_bounds = PQ.sq8_train_bounds(emb, DIM)
    sq8_packed = PQ.sq8_encode_packed(emb, sq8_bounds).localCheckpoint()
    run("sq8", "8bit per-dim *gate*", l2t,
        lambda: PQ.sq8_topk(sq8_packed, queries, sq8_bounds, K))
    # r8: exact-re-rank refinement (ivf_pq_topk_refined, FAISS
    # IndexRefineFlat) — shortlist k*4, exact L2 re-rank from the original
    # vectors; nprobe=4 mult=4 is the ann_pq_refine gate config. Recall is
    # bounded only by shortlist coverage, so it tracks nprobe tightly.
    for n_probe in [2, 4, 8]:
        dflt = " *gate*" if n_probe == 4 else ""
        run("ivf_pq_refined",
            f"nlist=8(t) RESID-trained nprobe={n_probe} mult=4{dflt}", l2t,
            lambda np_=n_probe: PQ.ivf_pq_topk_refined(
                emb, queries, km_cents, r_books, K, n_probe=np_, refine_mult=4))

    payload = {
        "sf_dir": SF_DIR,
        "n_corpus": int(len(ids)),
        "n_queries": len(qids),
        "k": K,
        "exact_cosine_topk_secs": round(exact_secs, 3),
        "results": results,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_recall.json"
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(f"written: {out_path}", file=sys.stderr)

    # markdown frontier table
    print(f"\n| family | config | recall@{K} | secs |")
    print("|---|---|---|---|")
    print(f"| exact | cosine_topk (baseline) | 1.000 | {exact_secs:.2f} |")
    for r in results:
        print(f"| {r['family']} | {r['config']} | {r['recall_at_10']:.3f} | {r['secs']:.2f} |")


if __name__ == "__main__":
    main()
