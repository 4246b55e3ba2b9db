#!/usr/bin/env python
"""Near-duplicate detection quality harness — the dedup sibling of
tools/ann_recall.py (which closed VERDICT r6 #1 for ANN retrieval).

Why this exists: the MinHash-LSH / SimHash driver gates prove each operator
runs its algorithm exactly as specified (bit-identical DuckDB replay) —
which says nothing about whether the band structure actually SURFACES the
true near-duplicate pairs. The banding S-curve P(candidate | jaccard=j) =
1 - (1 - j^r)^b is the whole quality story of LSH dedup, and it had never
been measured against this engine's own exact oracle. A change to the
shingle normalizer, the hash fold, or the band layout that silently guts
pair recall would pass every existing gate.

Ground truth is exact n-gram Jaccard from two sources:
- **organic pairs**: ngram_jaccard_pairs all-pairs shape on the raw corpus
  (the quadratic oracle that exists precisely for this). Measured: the
  synthetic corpus's organic near-dups are ALL jaccard >= 0.8, so organic
  truth alone cannot see the S-curve's mid-range.
- **a planted jaccard grid**: for each keep-fraction p in {0.3 .. 0.9} a
  copy of every doc truncated to its first ceil(p * n_tokens) tokens — the
  truncated shingle set is (almost exactly) a p-fraction subset of the
  original's, so the (doc, copy) pair lands at jaccard ~ p. Planted-pair
  truth is computed with the CANDIDATE-RESTRICTED exact verify
  (ngram_jaccard_pairs(candidates=planted)), which is linear — the
  quadratic all-pairs join never runs over the grid corpus.

What it measures:

- **pair recall per jaccard bucket** for each MinHash-LSH band config:
  fraction of true pairs with jaccard in [lo, hi) that the band-equality
  join surfaces as candidates, next to the theoretical S-curve mean
  1-(1-j^r)^b over the same pairs — measured ≈ theory is the evidence that
  the implementation's hashing is sound; measured ≪ theory would flag a
  broken fold/band layout that determinism gates cannot see.
- **candidate efficiency**: |candidates| per true pair at the production
  threshold (candidate precision) — the verify-cost side of the frontier.
- **signature estimation error**: MAE of the est_jaccard the signature
  reports vs exact jaccard on true pairs, next to the binomial theory
  std sqrt(j(1-j)/H) — the knob that decides how tight min_est can sit.
- **SimHash recall** per bucket at the default (bits=28, ngram=3,
  hamming<=3, 4 chunks) — SimHash ranks by feature-vector cosine, not set
  Jaccard, so its curve is expected to be softer; measuring it documents
  what the operator's contract actually buys.

Everything is deterministic (seeded minhash coefficients, fixed corpus), so
the pytest floors in tests/test_dedup.py pin the measured numbers at
sf0.01 and cannot flake.

Output: markdown tables on stdout + `.dedup_quality.json` at the repo root;
the frontier lives in PLANS.md §near-dup quality.

Usage: python tools/dedup_quality.py [sf_dir]
       (default /root/testdata/sf0.1; truth threshold 0.25)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from payroll_etl_fastapi_spark.operators import dedup as D  # noqa: E402
from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TRUTH_THRESHOLD = 0.25
BUCKETS = [(0.25, 0.3), (0.3, 0.4), (0.4, 0.5), (0.5, 0.6),
           (0.6, 0.7), (0.7, 0.8), (0.8, 0.9), (0.9, 1.01)]
# planted jaccard grid: keep-fraction p ~ resulting pair jaccard
GRID = [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
GRID_OFF = 10_000_000  # copy i of a doc gets id + (i+1) * GRID_OFF
# (num_hashes, bands) → r = num_hashes // bands; r=4 family sweeps recall up,
# r=8 entries show the precision-leaning end of the frontier
LSH_CONFIGS = [(16, 2), (16, 4), (32, 8), (64, 8), (64, 16), (128, 32)]
DEFAULT_CONFIG = (16, 4)  # minhash_lsh_pairs / dedup gates default
EST_HASHES = [16, 64, 128]
PASSES = 2


def s_curve(j: float, num_hashes: int, bands: int) -> float:
    r = num_hashes // bands
    return 1.0 - (1.0 - j**r) ** bands


def bucket_recall(truth: dict[tuple[int, int], float],
                  cand: set[tuple[int, int]],
                  num_hashes: int, bands: int) -> list[dict]:
    """Per-bucket measured recall vs the S-curve's prediction for the SAME
    pairs (mean of the per-pair theoretical probability — exact, no midpoint
    approximation)."""
    out = []
    for lo, hi in BUCKETS:
        pairs = [(p, j) for p, j in truth.items() if lo <= j < hi]
        if not pairs:
            out.append({"bucket": f"[{lo},{hi})", "n": 0,
                        "recall": None, "theory": None})
            continue
        hit = sum(1 for p, _ in pairs if p in cand)
        theo = sum(s_curve(j, num_hashes, bands) for _, j in pairs) / len(pairs)
        out.append({"bucket": f"[{lo},{hi})", "n": len(pairs),
                    "recall": round(hit / len(pairs), 4),
                    "theory": round(theo, 4)})
    return out


def overall_recall(truth: dict[tuple[int, int], float],
                   cand: set[tuple[int, int]], tau: float) -> float | None:
    pairs = [p for p, j in truth.items() if j >= tau]
    if not pairs:
        return None
    return sum(1 for p in pairs if p in cand) / len(pairs)


def main() -> None:
    spark = get_spark("dedup_quality")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    # ---- grid corpus: docs + truncated copies at each keep-fraction --------
    parts = [docs]
    for gi, p in enumerate(GRID):
        toks = F.split(D.normalize_text(F.col("text")), " ")
        keep = F.greatest(
            F.lit(4), F.ceil(F.size(toks) * F.lit(p)).cast("int")
        )
        parts.append(docs.select(
            (F.col("doc_id") + (gi + 1) * GRID_OFF).alias("doc_id"),
            F.array_join(F.slice(toks, 1, keep), " ").alias("text"),
        ))
    corpus = parts[0]
    for pp in parts[1:]:
        corpus = corpus.unionByName(pp)
    corpus = corpus.localCheckpoint()
    # mirror of the gate's collision guard (ADVICE r7): grid-copy ids must
    # stay unique for any id distribution — exact check, one aggregate
    dup = corpus.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col("doc_id"))).alias("d")
    ).first()[0]
    assert not dup, (
        f"{dup} grid-copy doc_id collisions — adjust GRID_OFF ({GRID_OFF}) "
        "for this id distribution"
    )
    planted = docs.select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.array(*[
            F.lit((gi + 1) * GRID_OFF) for gi in range(len(GRID))
        ])).alias("off"),
    ).select("id_a", (F.col("id_a") + F.col("off")).alias("id_b"))

    # ---- exact ground truth -------------------------------------------------
    # organic: all-pairs on the raw corpus (quadratic oracle shape, measured
    # safe at this scale); planted: candidate-restricted verify (linear)
    t0 = time.perf_counter()
    organic_rows = D.ngram_jaccard_pairs(
        docs, n=3, threshold=TRUTH_THRESHOLD
    ).collect()
    planted_rows = D.ngram_jaccard_pairs(
        corpus, n=3, threshold=0.0, candidates=planted
    ).collect()
    truth_secs = time.perf_counter() - t0
    organic = {(r.id_a, r.id_b): r.jaccard for r in organic_rows}
    truth = dict(organic)
    truth.update({(r.id_a, r.id_b): r.jaccard for r in planted_rows})
    print(f"corpus={n_docs} docs (+{len(GRID)} grid copies each); truth: "
          f"{len(organic)} organic pairs >= {TRUTH_THRESHOLD}, "
          f"{len(truth) - len(organic)} planted grid pairs in "
          f"{truth_secs:.1f}s", file=sys.stderr)

    results: dict = {"sf_dir": SF_DIR, "n_docs": n_docs, "grid": GRID,
                     "truth_threshold": TRUTH_THRESHOLD,
                     "n_truth_pairs": len(truth),
                     "n_organic_pairs": len(organic),
                     "lsh": [], "simhash": [], "estimation": []}

    # ---- MinHash-LSH candidate recall per band config ----------------------
    # candidates run over the GRID corpus so mid-jaccard buckets are
    # populated; candidate precision is computed over original-original
    # pairs only (grid copies pair with each other at jaccard ~ min(p,q) /
    # max(p,q) by construction — real near-dups that are deliberately not
    # in the truth map, so they must not count as false positives)
    for num_hashes, bands in LSH_CONFIGS:
        r = num_hashes // bands
        best = None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            cand_rows = D._lsh_candidates(
                D.minhash_signatures(corpus, num_hashes=num_hashes),
                num_hashes, bands,
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        cand = {(c.id_a, c.id_b) for c in cand_rows}
        buckets = bucket_recall(truth, cand, num_hashes, bands)
        rec50 = overall_recall(truth, cand, 0.5)
        rec80 = overall_recall(truth, cand, 0.8)
        n_true = sum(1 for j in truth.values() if j >= 0.5)
        orig_cand = {p for p in cand if p[0] < GRID_OFF and p[1] < GRID_OFF}
        prec = (sum(1 for p in orig_cand if organic.get(p, 0.0) >= 0.5)
                / len(orig_cand) if orig_cand else None)
        tag = " *default*" if (num_hashes, bands) == DEFAULT_CONFIG else ""
        entry = {"num_hashes": num_hashes, "bands": bands, "r": r,
                 "n_candidates": len(cand),
                 "recall_j>=0.5": round(rec50, 4) if rec50 is not None else None,
                 "recall_j>=0.8": round(rec80, 4) if rec80 is not None else None,
                 "cand_precision_j>=0.5": round(prec, 4) if prec is not None else None,
                 "secs": round(best, 2), "buckets": buckets,
                 "default": (num_hashes, bands) == DEFAULT_CONFIG}
        results["lsh"].append(entry)
        print(f"  lsh H={num_hashes:3d} b={bands:2d} r={r}  cands={len(cand):6d}  "
              f"recall@0.5={rec50 if rec50 is not None else float('nan'):.3f}  "
              f"recall@0.8={rec80 if rec80 is not None else float('nan'):.3f}  "
              f"prec@0.5={prec if prec is not None else float('nan'):.3f}  "
              f"({n_true} true>=0.5)  {best:5.1f}s{tag}", file=sys.stderr)

    # ---- signature estimation error on true pairs (full jaccard range) -----
    for num_hashes in EST_HASHES:
        sig_rows = D.minhash_signatures(corpus, num_hashes=num_hashes).collect()
        sigs = {r.id: [r[f"mh_{i}"] for i in range(num_hashes)] for r in sig_rows}
        errs, theos = [], []
        for (a, b), j in truth.items():
            sa, sb = sigs[a], sigs[b]
            est = sum(1 for x, y in zip(sa, sb) if x == y) / num_hashes
            errs.append(abs(est - j))
            theos.append((j * (1 - j) / num_hashes) ** 0.5)
        mae = sum(errs) / len(errs) if errs else None
        theo_mae = (sum(theos) / len(theos) * 0.7979) if theos else None  # E|N(0,s)| = s*sqrt(2/pi)
        results["estimation"].append(
            {"num_hashes": num_hashes,
             "mae": round(mae, 4) if mae is not None else None,
             "theory_mae": round(theo_mae, 4) if theo_mae is not None else None})
        print(f"  est H={num_hashes:3d}  MAE={mae:.4f}  theory≈{theo_mae:.4f}",
              file=sys.stderr)

    # ---- SimHash default config recall -------------------------------------
    # on a doc_id % 5 slice of the grid corpus: the 28-bit / 4-chunk blocking
    # keys have only 2^7 values per chunk, so candidate volume grows
    # quadratically with corpus size on this saturated-vocabulary synthetic
    # corpus — the slice keeps the harness honest without the blow-up
    sub = corpus.filter(F.col("doc_id") % 5 == 0)
    sub_truth = {p: j for p, j in truth.items()
                 if p[0] % 5 == 0 and p[1] % 5 == 0}
    for max_distance, chunks in [(3, 4), (2, 4)]:
        best = None
        for _ in range(PASSES):
            t0 = time.perf_counter()
            sh_rows = D.simhash_pairs(
                sub, max_distance=max_distance, chunks=chunks
            ).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        sh_cand = {(r.id_a, r.id_b) for r in sh_rows}
        rec80 = overall_recall(sub_truth, sh_cand, 0.8)
        rec90 = overall_recall(sub_truth, sh_cand, 0.9)
        sh_buckets = []
        for lo, hi in BUCKETS:
            pairs = [p for p, j in sub_truth.items() if lo <= j < hi]
            if not pairs:
                sh_buckets.append({"bucket": f"[{lo},{hi})", "n": 0,
                                   "recall": None})
                continue
            hit = sum(1 for p in pairs if p in sh_cand)
            sh_buckets.append({"bucket": f"[{lo},{hi})", "n": len(pairs),
                               "recall": round(hit / len(pairs), 4)})
        results["simhash"].append(
            {"bits": D.SIMHASH_BITS, "max_distance": max_distance,
             "chunks": chunks, "n_pairs": len(sh_cand),
             "recall_j>=0.8": round(rec80, 4) if rec80 is not None else None,
             "recall_j>=0.9": round(rec90, 4) if rec90 is not None else None,
             "secs": round(best, 2), "buckets": sh_buckets})
        print(f"  simhash d<={max_distance} chunks={chunks}  pairs={len(sh_cand):6d}  "
              f"recall@0.8={rec80 if rec80 is not None else float('nan'):.3f}  "
              f"recall@0.9={rec90 if rec90 is not None else float('nan'):.3f}  "
              f"{best:5.1f}s", file=sys.stderr)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".dedup_quality.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)

    # markdown frontier for PLANS.md
    print("\n| config | r | candidates | recall j>=0.5 | recall j>=0.8 | "
          "cand precision j>=0.5 | secs |")
    print("|---|---|---|---|---|---|---|")
    for e in results["lsh"]:
        d = " **(default)**" if e["default"] else ""
        print(f"| H={e['num_hashes']} b={e['bands']}{d} | {e['r']} | "
              f"{e['n_candidates']} | {e['recall_j>=0.5']} | "
              f"{e['recall_j>=0.8']} | {e['cand_precision_j>=0.5']} | "
              f"{e['secs']} |")
    print("\nper-bucket (default config vs theory):")
    dflt = next(e for e in results["lsh"] if e["default"])
    print("| jaccard bucket | n pairs | measured | S-curve |")
    print("|---|---|---|---|")
    for b in dflt["buckets"]:
        print(f"| {b['bucket']} | {b['n']} | {b['recall']} | {b['theory']} |")

    spark.stop()


if __name__ == "__main__":
    main()
