#!/usr/bin/env python
"""Sketch-accuracy harness — the fourth member of the round-7 quality
series (ANN recall, near-dup S-curve, known-item ranking, now sketch
error): every probabilistic/approximate summary in operators/sketch.py and
operators/approx.py carries a published error contract, and none of them
had ever been MEASURED against it. The driver gates prove each sketch
computes its algorithm exactly (bit-identical DuckDB replay) — they cannot
see a contract violation baked into the spec (wrong width constant, a
mantissa bit dropped, a biased estimator), which would corrupt every
downstream monitoring decision while staying deterministic.

Measured against exact answers on the driver testdata:

- **Count-min (depth 4 × width 1024)** over document tokens: per-key
  overestimate (CMS never underestimates — asserted on every key) vs the
  Cormode-Muthukrishnan bound: P(err > εN) ≤ e^-depth with ε = e/width.
  Reported: mean / p99 / max overestimate and the measured violation rate
  of the εN line vs the e^-4 ≈ 1.8% theory.
- **HyperLogLog (m = 256, raw estimator)** at several true cardinalities
  (token vocab, user_id, doc_id, event_id slices): relative error per
  point vs the 1.04/√m ≈ 6.5% RSE theory (raw estimator: bias grows below
  ~2.5·m = 640 — points under that are reported but flagged, matching the
  documented "raw estimator" contract in sketch.py).
- **HDR histogram (5 mantissa bits)** on order totals in cents: p50/p90/p99
  lower bounds vs exact percentiles — the contract is HARD (every answer
  within 2^-5 ≈ 3.1% below the true quantile, never above), so violations
  are bugs, not statistics.
- **approx_percentile (accuracy = 10000)** vs exact: rank error ≤
  n/accuracy by Spark's GK contract.

Deterministic corpus + seeded hashes ⇒ the pytest floors in
tests/test_sketch.py pin the measured numbers and cannot flake.

Output: stdout markdown + `.sketch_quality.json`.
Usage: python tools/sketch_quality.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from payroll_etl_fastapi_spark.operators import sketch as SK  # noqa: E402
from payroll_etl_fastapi_spark.operators.text import tokens  # noqa: E402
from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def cms_accuracy(spark, sf_dir: str) -> dict:
    # stream = events.user_id: MORE distinct keys than CMS buckets at sf0.1
    # (1,500 users vs width 1024), so bucket collisions are real — the first
    # cut used document tokens, whose ~31-word synthetic vocabulary cannot
    # collide in a 1024-wide row and measured a vacuous zero error
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    toks = ev.select(F.col("user_id").cast("string").alias("tok"))
    toks = toks.localCheckpoint()
    n_total = toks.count()
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    cms = SK.cms_build(toks, "tok")
    est = SK.cms_estimate(cms, exact.select(F.col("tok")), "tok")
    joined = est.join(exact, "tok").select(
        "tok", "true_cnt", F.col("cms_count").alias("est")
    )
    rows = joined.collect()
    overs = [r.est - r.true_cnt for r in rows]
    assert all(o >= 0 for o in overs), "CMS underestimated — hard bug"
    eps = math.e / SK.CMS_WIDTH
    line = eps * n_total
    viol = sum(1 for o in overs if o > line) / len(overs)
    overs.sort()
    return {
        "n_keys": len(overs), "stream_n": n_total,
        "depth": SK.CMS_DEPTH, "width": SK.CMS_WIDTH,
        "mean_over": round(sum(overs) / len(overs), 2),
        "p99_over": overs[int(0.99 * len(overs))],
        "max_over": overs[-1],
        "epsN": round(line, 1),
        "violation_rate": round(viol, 4),
        "theory_violation_bound": round(math.exp(-SK.CMS_DEPTH), 4),
    }


def hll_accuracy(spark, sf_dir: str) -> list[dict]:
    out = []
    cases = [
        ("doc tokens", spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.explode(tokens(F.col("text"))).alias("k"))),
        ("user_id", spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .select(F.col("user_id").alias("k"))),
        ("event_id", spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .select(F.col("event_id").alias("k"))),
        ("doc_id", spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").alias("k"))),
        ("o_custkey", spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select(F.col("o_custkey").alias("k"))),
    ]
    rse = 1.04 / math.sqrt(SK.HLL_M)
    for name, df in cases:
        true = df.distinct().count()
        regs = SK.hll_registers(df, "k").localCheckpoint()
        raw = SK.hll_estimate(regs).first().hll_est
        corr = SK.hll_estimate_corrected(regs).first()
        out.append({
            "column": name, "true": true,
            "raw_est": round(raw, 1),
            "raw_rel_err": round((raw - true) / true, 4),
            "corrected_est": round(corr.hll_est, 1),
            "corrected_rel_err": round((corr.hll_est - true) / true, 4),
            "estimator": corr.estimator,
            "theory_rse": round(rse, 4),
            "raw_estimator_biased_range": true < 2.5 * SK.HLL_M,
        })
    return out


def hdr_accuracy(spark, sf_dir: str) -> list[dict]:
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    hist = SK.hdr_histogram(orders, "cents")
    qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    sk_row = SK.hdr_quantiles(hist, qs).first()
    exact_row = orders.agg(
        *[
            F.expr(f"percentile(cents, {num}/{den})").alias(nm)
            for nm, num, den in qs
        ]
    ).first()
    bound = 2.0 ** (-SK.HDR_MBITS)
    out = []
    for nm, _, _ in qs:
        est, true = sk_row[nm], exact_row[nm]
        rel = (true - est) / true  # sketch reports a LOWER bound
        out.append({
            "quantile": nm, "exact": round(true, 1), "sketch": int(est),
            "rel_below": round(rel, 4), "hard_bound": round(bound, 4),
            "within_contract": bool(0 <= rel <= bound),
        })
    return out


def gk_accuracy(spark, sf_dir: str) -> dict:
    acc = 10000
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.col("l_extendedprice").alias("v")
    ).localCheckpoint()
    n = li.count()
    est = li.agg(F.expr(f"approx_percentile(v, 0.5, {acc})").alias("m")).first().m
    rank = li.filter(F.col("v") <= est).count()
    rank_err = abs(rank - 0.5 * n)
    return {
        "n": n, "accuracy": acc, "target_rank": int(0.5 * n),
        "est_rank": rank, "rank_err": int(rank_err),
        "bound": round(n / acc, 1),
        "within_contract": bool(rank_err <= n / acc + 1),
    }


def bloom_accuracy(spark, sf_dir: str) -> dict:
    from payroll_etl_fastapi_spark.operators import bloom as B

    members = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).select(
        F.col("c_custkey").alias("k")
    )
    n = members.distinct().count()
    words = B.bloom_build(members, "k")
    # probes guaranteed absent: keys offset far beyond the key space
    n_probes = 100_000
    absent = spark.range(n_probes).select(
        (F.col("id") + 1_000_000_000).alias("k")
    )
    fp = absent.filter(
        B.bloom_might_contain(F.col("k"), words)
    ).count()
    theory = (1.0 - math.exp(-B.BLOOM_HASHES * n / B.BLOOM_BITS)) ** B.BLOOM_HASHES
    return {
        "bits": B.BLOOM_BITS, "hashes": B.BLOOM_HASHES, "n_keys": n,
        "n_probes": n_probes, "false_positives": fp,
        "measured_fpr": round(fp / n_probes, 5),
        "theory_fpr": round(theory, 5),
    }


def main() -> None:
    spark = get_spark("sketch_quality")
    spark.range(1000).selectExpr("sum(id)").collect()
    results = {
        "sf_dir": SF_DIR,
        "cms": cms_accuracy(spark, SF_DIR),
        "hll": hll_accuracy(spark, SF_DIR),
        "hdr": hdr_accuracy(spark, SF_DIR),
        "gk": gk_accuracy(spark, SF_DIR),
        "bloom": bloom_accuracy(spark, SF_DIR),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".sketch_quality.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)

    c = results["cms"]
    print(f"CMS d={c['depth']} w={c['width']}: {c['n_keys']} keys over "
          f"{c['stream_n']}-token stream — mean over {c['mean_over']}, "
          f"p99 {c['p99_over']}, max {c['max_over']}; eps*N={c['epsN']}, "
          f"violations {c['violation_rate']:.2%} (theory <= "
          f"{c['theory_violation_bound']:.2%})")
    print(f"\nHLL m={SK.HLL_M} (theory RSE {1.04 / math.sqrt(SK.HLL_M):.3f}; "
          "corrected = + LinearCounting below 2.5m):")
    for h in results["hll"]:
        print(f"  {h['column']:12s} true={h['true']:>7} "
              f"raw={h['raw_est']:>9} ({h['raw_rel_err']:+.3f})  "
              f"corrected={h['corrected_est']:>9} ({h['corrected_rel_err']:+.3f}) "
              f"[{h['estimator']}]")
    print(f"\nHDR m={SK.HDR_MBITS} bits (hard bound {2.0 ** -SK.HDR_MBITS:.3f} "
          "relative, lower side only):")
    for h in results["hdr"]:
        print(f"  {h['quantile']}: exact={h['exact']} sketch={h['sketch']} "
              f"rel_below={h['rel_below']:+.4f} within={h['within_contract']}")
    g = results["gk"]
    print(f"\napprox_percentile acc={g['accuracy']}: rank_err {g['rank_err']} "
          f"of n={g['n']} (bound {g['bound']}) within={g['within_contract']}")
    bl = results["bloom"]
    print(f"\nbloom {bl['bits']} bits / {bl['hashes']} hashes over "
          f"{bl['n_keys']} keys: measured FPR {bl['measured_fpr']:.4%} vs "
          f"theory {bl['theory_fpr']:.4%} ({bl['false_positives']} of "
          f"{bl['n_probes']} absent probes)")
    print(f"\nwrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
