#!/usr/bin/env python
"""Interleaved A/B for one gate (PLANS.md rule: a >2× cross-round delta is
actionable only with an interleaved A/B — VERDICT r5 #2).

In ONE long-lived JVM (the bench condition), alternates:
  A = the gate timed after an untimed GC (bench's standalone condition)
  B = the gate timed immediately after an untimed run of a heavy CONTEXT
      gate (the suite-position condition under suspicion)
for --reps rounds, A B A B …, so slow drift (JIT state, heap growth) hits
both arms equally. If B ≫ A the regression is positional (GC/heap debt
charged to the victim); if both match the cross-round number the code
actually regressed.

Usage:
  python tools/ab_query.py vocab_bpe_merges --context dedup_keep_best --reps 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("gate")
    ap.add_argument("--context", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from payroll_etl_fastapi_spark.session import get_spark

    qs = entry_mod.queries()
    fn = qs[args.gate]
    ctx = qs[args.context] if args.context else None

    spark = get_spark("ab-query")
    spark.range(1000).selectExpr("sum(id)").collect()
    fn(spark, SF_DIR).collect()  # warmup: JIT/codegen for this exact plan

    a_samples, b_samples = [], []
    for _ in range(args.reps):
        # A: standalone after GC (bench condition)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).collect()
        a_samples.append(round(time.perf_counter() - t0, 2))
        # B: immediately after the heavy context, NO gc between (position
        # condition: the context's garbage is live when the gate starts)
        if ctx is not None:
            spark.catalog.clearCache()
            ctx(spark, SF_DIR).collect()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            b_samples.append(round(time.perf_counter() - t0, 2))
    out = {
        "gate": args.gate,
        "context": args.context,
        "sf_dir": SF_DIR,
        "a_standalone": a_samples,
        "b_after_context": b_samples,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
