#!/usr/bin/env python
"""Semantic-dedup PAIR-recall harness (VERDICT r10 #4) — the dedup-shape
sibling of tools/ann_recall.py.

Why this exists: stage_semantic_dedup routes target_recall through the ANN
planner and dispatches each family in its DEDUP shape (banded self-join
with exact-cosine verify for the LSH families; SemDeDup within-cluster
dedup for the IVF families). The committed frontier floors are RETRIEVAL
recall@10 numbers — a different quantity than "what fraction of true
near-dup pairs does the dedup shape catch". Until this harness, the facade
mapped one onto the other by argument; now every dispatchable family's
pair recall is measured on a planted corpus and committed as its own floor
(tools/quality_baseline.json semantic_dedup_pair_floors), which
ann_plan(shape="dedup") qualifies against.

Planted corpus (fully deterministic, seed 1234): N_BASE isotropic 64-d
gaussian bases (pairwise cosine ~0 at this dimension — no organic pairs)
plus one twin per base, the base rotated to an EXACT planted cosine drawn
evenly from [0.905, 0.98] (construction: twin = cos(theta) * u + sin(theta)
* w with w a unit vector orthogonal to u, so the planted cosine is exact up
to float rounding). Every (base, twin) pair is a true near-dup at the gate
threshold 0.9; the spread across [0.905, 0.98] exercises the banding
S-curve's mid-range where configs actually differ, instead of saturating
recall at cosine ~1.

Measured per dispatchable family (the exact configs ANN_FRONTIER commits):
- lsh / lsh_multiprobe: embedding_near_dup_pairs at threshold 0.9 —
  pair recall = planted pairs surfaced AND cosine-verified.
- ivf / ivf_kmeans: semantic_dedup under the same quantizer construction
  the facade dispatches (lowest-id sample / trained k-means) — pair recall
  = planted twins dropped (the keep-lowest-id verdict). Cross-cluster
  misses are the published SemDeDup trade, so these floors sit naturally
  below the LSH families'.

Writes .semdedup_quality.json at the repo root; tools/quality_assert.py
checks it against the committed floors.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THRESHOLD = 0.9
N_BASE = 400
DIM = 64
TWIN_OFFSET = 100_000


def planted_corpus(spark):
    """(emb DataFrame, planted pair list [(base_id, twin_id)])."""
    rng = np.random.default_rng(1234)
    base = rng.standard_normal((N_BASE, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # exact planted cosines, evenly spread across the verify-band above the
    # threshold (0.905 .. 0.98) — deterministic per base id
    cosines = 0.905 + 0.075 * (np.arange(N_BASE) / max(1, N_BASE - 1))
    noise = rng.standard_normal((N_BASE, DIM))
    rows = []
    for i in range(N_BASE):
        u = base[i]
        w = noise[i] - np.dot(noise[i], u) * u
        w /= np.linalg.norm(w)
        c = cosines[i]
        twin = c * u + np.sqrt(1.0 - c * c) * w
        rows.append((int(i), [float(x) for x in u]))
        rows.append((int(TWIN_OFFSET + i), [float(x) for x in twin]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = [(i, TWIN_OFFSET + i) for i in range(N_BASE)]
    return emb, pairs


def measure(spark) -> dict:
    from payroll_etl_fastapi_spark.operators import corpus as C
    from payroll_etl_fastapi_spark.operators import similarity as S

    emb, planted = planted_corpus(spark)
    emb = emb.localCheckpoint()
    planted_set = set(planted)
    n_total = 2 * N_BASE
    results = []
    for c in S.ANN_FRONTIER:
        if c["metric"] != "cosine":
            continue
        fam, prm = c["family"], c["params"]
        junk = None
        if fam in ("lsh", "lsh_multiprobe"):
            # measure the DISPATCHED shape: the threshold-derived
            # self-join banding stage_semantic_dedup actually runs
            # (round 11 — the retrieval banding admitted 81% of random
            # pairs as candidates and went quadratic at sf1), not the
            # retrieval planes/bands
            planes_n, bands_n, flips = C.dedup_lsh_banding(
                THRESHOLD, multiprobe=(fam == "lsh_multiprobe")
            )
            pairs = S.embedding_near_dup_pairs(
                emb,
                THRESHOLD,
                dim=DIM,
                num_planes=planes_n,
                bands=bands_n,
                n_probe_flips=flips,
            )
            caught = {
                (int(r.id_a), int(r.id_b)) for r in pairs.collect()
            } & planted_set
            recall = len(caught) / len(planted_set)
            # junk mass: candidate fraction among NON-planted pairs (the
            # n^2 coefficient a self-join pays at scale). Candidates =
            # the banded join BEFORE the cosine verify.
            planes = S.hyperplane_signs(planes_n, DIM)
            sigs = S.band_signatures("embedding", planes, bands_n)
            import pyspark.sql.functions as F

            b_arr = F.array(
                *[
                    F.struct(F.lit(i).alias("band"), s.alias("sig"))
                    for i, s in enumerate(sigs)
                ]
            )
            hashed = (
                emb.select(F.col("vec_id").alias("id"), F.explode(b_arr).alias("bs"))
                .select("id", "bs.band", "bs.sig")
                .localCheckpoint()
            )
            if flips:
                parr = S.probe_band_signatures("embedding", planes, bands_n, flips)

                def _tag(i):
                    return lambda s: F.struct(F.lit(i).alias("band"), s.alias("sig"))

                entries = F.flatten(
                    F.array(*[F.transform(a, _tag(i)) for i, a in enumerate(parr)])
                )
                probe = (
                    emb.select(
                        F.col("vec_id").alias("id"), F.explode(entries).alias("bs")
                    )
                    .select("id", "bs.band", "bs.sig")
                )
                cand = (
                    probe.select(F.col("id").alias("id_a"), "band", "sig")
                    .join(
                        hashed.select(F.col("id").alias("id_b"), "band", "sig"),
                        ["band", "sig"],
                    )
                    .filter("id_a != id_b")
                    .selectExpr(
                        "least(id_a, id_b) AS id_a", "greatest(id_a, id_b) AS id_b"
                    )
                    .dropDuplicates(["id_a", "id_b"])
                )
            else:
                cand = (
                    hashed.select(F.col("id").alias("id_a"), "band", "sig")
                    .join(
                        hashed.select(F.col("id").alias("id_b"), "band", "sig"),
                        ["band", "sig"],
                    )
                    .filter("id_a < id_b")
                    .dropDuplicates(["id_a", "id_b"])
                )
            n_cand = cand.count()
            n_cand_junk = n_cand - len(
                {(int(r.id_a), int(r.id_b)) for r in cand.collect()} & planted_set
            )
            n_pairs_all = n_total * (n_total - 1) // 2 - len(planted_set)
            junk = n_cand_junk / n_pairs_all
        elif fam in ("ivf", "ivf_kmeans"):
            if fam == "ivf_kmeans":
                kcents = S.train_centroids_kmeans(
                    emb, n_centroids=prm["n_centroids"], n_iters=prm["n_iters"]
                )
                cents = [v for _, v in kcents]
            else:
                cents = [
                    list(r.embedding)
                    for r in emb.orderBy("vec_id")
                    .limit(prm["n_centroids"])
                    .collect()
                ]
            verdicts = S.semantic_dedup(emb, cents, THRESHOLD)
            dropped = {
                int(r.id) for r in verdicts.filter("is_dropped = 1").collect()
            }
            recall = sum(1 for _b, t in planted if t in dropped) / len(planted)
        else:  # pragma: no cover - no other cosine families committed
            continue
        entry = {
            "family": fam,
            "config": c["config"],  # the frontier-row key quality_assert matches
            "pair_recall": round(recall, 4),
            "n_pairs": len(planted),
        }
        if junk is not None:
            entry["junk_fraction"] = round(junk, 6)
            entry["dispatched"] = (
                f"selfjoin planes={planes_n} bands={bands_n} flips={flips}"
            )
        results.append(entry)
        print(
            f"{fam:15s} {c['config']:30s} pair_recall={recall:.4f}"
            + (f" junk={junk:.4f}" if junk is not None else "")
        )
    return {
        "threshold": THRESHOLD,
        "corpus": f"{N_BASE} isotropic bases + exact-cosine twins in [0.905, 0.98], dim {DIM}",
        "results": results,
    }


def main() -> int:
    from payroll_etl_fastapi_spark.session import get_spark

    spark = get_spark("semdedup-quality")
    out = measure(spark)
    path = os.path.join(REPO, ".semdedup_quality.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
