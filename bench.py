#!/usr/bin/env python
"""Benchmark harness: runs the engine's query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:

    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"n": N, "detail": "BENCH_DETAIL.json"}, "sf": <sf>}

MIN-OF-N INTERLEAVED PASSES (VERDICT r5 #2): the suite runs
$SPARK_GRAFT_BENCH_PASSES (default 2) full passes — pass 2 revisits every
query only after the whole suite ran once, so a query's second sample lands
in a different heap/JIT/page-cache neighborhood than its first. The reported
per-query number and the suite total are the per-query MINIMUM across
passes; per-pass samples are kept in BENCH_DETAIL.json. Rationale: rounds
3-5 each produced exactly one >1.7× cross-round outlier with untouched code
(r4 streaming_hourly_filesink, r5 vocab_bpe_merges), every one an artifact
of suite-position/GC attribution in a single-pass measurement. The min is
the honest steady-state estimator for a long-lived-server comparison; the
per-pass spread makes position artifacts visible instead of costing a round
of investigation. ESTIMATOR DISCLOSURE (ADVICE r6): min-of-N is a different
estimator than rounds 1-5's single pass, so the payload also carries
`first_pass_total` (the old estimator, like-for-like with r1-r5 headline
numbers) and `median_total` — quote cross-round ratios against the matching
estimator, never across the r5→r6 switch.

SETUP/QUERY SPLIT (VERDICT r5 #4): each sample is timed in two spans —
`setup` = the gate callable itself (eager construction: TxTable lifecycles,
stream drains, warclite corpus writes, driver-side golden collects) and
`exec` = .collect() on the returned frame (the declared query). Gates that
build synthetic corpora lazily (unions/mutations inside the plan) still
charge that to exec — the split isolates the eager-harness cost, which is
what dominates the expensive tail. BENCH_DETAIL carries setup/exec per pass;
the headline per-query value remains setup+exec (full user-visible latency,
comparable with all prior rounds).

Per-query time is wall-clock to build the plan AND materialize the result
(collect), i.e. the full user-visible latency of each operator. The session
is created once, outside the timed region, and a trivial job is run first to
warm the JVM / codegen paths — the reference's baseline is a long-lived
Postgres server, so steady-state latency is the honest comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
# Methodology version stamped into BENCH_DETAIL.json and the stdout payload
# (ADVICE r7): bumps whenever the measurement protocol changes, so tooling
# can refuse cross-methodology deltas instead of silently comparing a
# warm-input run against a pre-r7 mixed-cache one. History:
#   v1 = r1-r6 (first-pass inputs cold or OS-cache-dependent)
#   v2-warm = r7+ (all parquet inputs page-cache-warmed before timing;
#            first_pass_total is NOT a cold-start number)
METHODOLOGY = "v2-warm"

# The driver captures only the LAST ~2000 characters of combined output and
# parses the final stdout line (measured: every BENCH_r*.json "tail" is
# exactly 2000 chars; round 2's 69-entry unrounded line overflowed it and
# parsed null). The final line must therefore fit the capture with margin.
_LINE_BUDGET = 1900


def _build_payload(
    base: dict, timings: dict[str, float | None], budget: int = _LINE_BUDGET
) -> str:
    """One-line JSON payload with REAL name→seconds entries in ``queries``
    (VERDICT r12 #1: the r2-r12 compact form ``{"n": N, "detail": ...}`` fed
    the driver a bogus query named "n" and starved its per-query PERF and
    scaling computations). The full 164-gate map is ~5 KB — measured over
    the driver's 2000-char tail capture — so the line carries the MOST
    EXPENSIVE gates first, as many as fit the budget, rounded to 0.01 s;
    ``n_queries``/``n_omitted`` disclose the truncation and the full map
    stays in BENCH_DETAIL.json. Only real gate names ever appear as keys of
    ``queries``."""
    payload = dict(base)
    ranked = sorted(
        (n for n, t in timings.items() if t is not None),
        key=lambda n: (-timings[n], n),
    )
    payload["queries"] = {n: round(timings[n], 2) for n in ranked}
    payload["n_queries"] = len(timings)
    payload["detail"] = "BENCH_DETAIL.json"
    # reserve width for the n_omitted disclosure BEFORE trimming, so adding
    # it afterwards cannot push the line back over budget
    payload["n_omitted"] = len(ranked)
    dumps = lambda p: json.dumps(p, separators=(",", ":"))  # noqa: E731
    omitted = 0
    for name in reversed(ranked):
        if len(dumps(payload)) <= budget:
            break
        del payload["queries"][name]
        omitted += 1
    if omitted:
        payload["n_omitted"] = omitted
    else:
        del payload["n_omitted"]
    return dumps(payload)


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    # JVM / codegen / parquet-reader warmup — steady-state latency is the
    # honest comparison (the baseline is a long-lived server), and without
    # this the first timed query absorbs ~1s of one-time JIT cost
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")).agg(
        {"n_nationkey": "sum"}
    ).collect()
    # Input-file cache warm (round 7): four identical-code runs spread
    # 252.8-297.8 s purely on page-cache state — the OS cache had been
    # dropped by unrelated heavy jobs, and every gate moved uniformly with
    # cache temperature. Reading the input bytes once before timing removes
    # the dominant environmental variable; warm-vs-warm is the steady-state
    # comparison a long-lived server sees (and what prior rounds measured
    # when their sweeps happened to precede the bench). Disclosed in the
    # payload as warmed_inputs; the timed estimator is unchanged.
    for root, _dirs, files in os.walk(SF_DIR):
        for fname in files:
            if fname.endswith(".parquet") or fname.endswith(".crc"):
                with open(os.path.join(root, fname), "rb") as fh:
                    while fh.read(1 << 22):
                        pass

    qs = entry_mod.queries()
    samples: dict[str, list[dict]] = {n: [] for n in qs}
    failed: list[str] = []
    for pass_no in range(PASSES):
        for name, fn in qs.items():
            if name in failed:
                continue  # a query that failed once stays failed (no min-rescue)
            spark.catalog.clearCache()  # timed standalone, no cross-query reuse
            # Untimed GC between queries: the suite shares one long-lived JVM,
            # and a heap full of the previous queries' garbage otherwise
            # charges a multi-second stop-the-world pause to whichever query
            # triggers it (observed: a 14s query reading 42s in-suite).
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            try:
                df = fn(spark, SF_DIR)
                t1 = time.perf_counter()
                df.collect()
                t2 = time.perf_counter()
            except Exception as exc:  # a broken query must not hide the others
                dt = time.perf_counter() - t0
                print(
                    f"bench: query {name} FAILED after {dt:.2f}s (pass {pass_no + 1}): {exc}",
                    file=sys.stderr,
                )
                failed.append(name)
                continue
            samples[name].append(
                {
                    "setup": round(t1 - t0, 4),
                    "exec": round(t2 - t1, 4),
                    "total": round(t2 - t0, 4),
                }
            )

    # failures are first-class in the JSON: null timing, excluded from the
    # total — a broken query must not make the suite look faster
    timings: dict[str, float | None] = {}
    total = 0.0
    # Estimator disclosure (ADVICE r6): the headline is min-of-N, which is a
    # DIFFERENT estimator than rounds 1-5's single pass — publish the
    # first-pass total (≡ the old estimator) and the median total alongside,
    # so cross-round ratios can be quoted against a like-for-like number
    # instead of silently mixing estimators.
    first_pass_total = 0.0
    median_total = 0.0
    for name in qs:
        if name in failed or not samples[name]:
            timings[name] = None
            continue
        totals = sorted(s["total"] for s in samples[name])
        best = totals[0]
        timings[name] = best
        total += best
        first_pass_total += samples[name][0]["total"]
        mid = len(totals) // 2
        median_total += (
            totals[mid]
            if len(totals) % 2 == 1
            else (totals[mid - 1] + totals[mid]) / 2.0
        )

    detail = {
        "metric": "suite_seconds",
        "value": round(total, 4),
        "estimator": f"min_of_{PASSES}",
        "methodology": METHODOLOGY,
        "warmed_inputs": True,
        "first_pass_total": round(first_pass_total, 4),
        "median_total": round(median_total, 4),
        "unit": "sec",
        "queries": timings,
        "passes": {n: s for n, s in samples.items() if s},
        "n_passes": PASSES,
        "sf": _sf_from_dir(SF_DIR),
    }
    if failed:
        detail["failed"] = failed
    # Per-query detail goes to a file; the final stdout line stays compact.
    # Round 2's single line carried 69 query timings and outgrew the driver's
    # tail capture (BENCH_r02 "parsed": null) — the driver parses only the last
    # stdout line, so that line must be short and self-contained.
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(f"bench: per-query detail written to {detail_path}", file=sys.stderr)
    base = {
        "metric": "suite_seconds",
        "value": round(total, 4),
        "estimator": f"min_of_{PASSES}",
        "methodology": METHODOLOGY,
        "warmed_inputs": True,
        "first_pass_total": round(first_pass_total, 4),
        "median_total": round(median_total, 4),
        "unit": "sec",
        "sf": _sf_from_dir(SF_DIR),
    }
    if failed:
        base["failed"] = failed
    print(_build_payload(base, timings))


if __name__ == "__main__":
    main()
