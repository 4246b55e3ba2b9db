#!/usr/bin/env python
"""Asserted gate over the three quality-measurement harnesses (VERDICT r7 #3).

tools/ann_recall.py, tools/dedup_quality.py and tools/sketch_quality.py were
round-7 instruments that measured retrieval/detection/estimation quality and
committed JSON artifacts — but nothing FAILED if a number drifted between
rounds. This tool applies the tools/sf1_validate.py --assert pattern to them:

- `tools/quality_baseline.json` commits the quality contracts: recall FLOORS
  for the production/gate ANN and dedup configs, error/FPR CEILINGS for the
  sketches. Floors/ceilings rather than two-sided tolerances on purpose —
  quality improving is never a regression; quality degrading always is.
  The baseline updates DELIBERATELY in the same commit as a change that is
  known to shift a contract, never to make a red assert pass.
- `check_quality(artifacts, baseline)` is a PURE function returning failure
  strings (unit-tested in tests/test_quality_assert.py without running the
  20-minute harnesses, like test_sf1_assert.py drives sf1's verdict logic).
- main() reads the committed artifacts (or re-runs the harnesses first with
  --run) and exits nonzero on any violated contract — the per-round gate.

Usage:
  python tools/quality_assert.py            # check committed artifacts
  python tools/quality_assert.py --run      # re-run all three harnesses at
                                            # sf0.1 first (fresh artifacts),
                                            # then check
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
BASELINE_PATH = os.path.join(HERE, "quality_baseline.json")
ARTIFACTS = {
    "ann": ".ann_recall.json",
    "dedup": ".dedup_quality.json",
    "sketch": ".sketch_quality.json",
    "semdedup": ".semdedup_quality.json",
}
HARNESSES = {
    "ann": "ann_recall.py",
    "dedup": "dedup_quality.py",
    "sketch": "sketch_quality.py",
    "semdedup": "semdedup_quality.py",
}


def _ann_key(entry: dict) -> str:
    """(family, config) key with the presentation-only *default*/*gate*
    markers stripped, so moving a marker never orphans a baseline entry."""
    config = entry["config"].replace(" *default*", "").replace(" *gate*", "")
    return f"{entry['family']}|{config}"


def check_quality(artifacts: dict, baseline: dict) -> list[str]:
    """Failure strings for every violated quality contract; [] == green.

    artifacts: {"ann": <.ann_recall.json>, "dedup": <.dedup_quality.json>,
                "sketch": <.sketch_quality.json>} — any missing harness is
    itself a failure (the round checklist must run all three).
    """
    fails: list[str] = []

    # ---- ANN: recall floors on the gate/production configs ----------------
    ann = artifacts.get("ann")
    if ann is None:
        fails.append("ann: .ann_recall.json missing — run tools/ann_recall.py")
    else:
        measured = {_ann_key(e): e["recall_at_10"] for e in ann.get("results", [])}
        for key, floor in baseline.get("ann_recall_floors", {}).items():
            got = measured.get(key)
            if got is None:
                fails.append(f"ann: config {key!r} absent from the frontier sweep")
            elif got < floor:
                fails.append(f"ann: {key} recall@10 {got} < floor {floor}")

    # ---- dedup: per-config pair-recall floors + estimator-MAE ceiling -----
    ded = artifacts.get("dedup")
    if ded is None:
        fails.append("dedup: .dedup_quality.json missing — run tools/dedup_quality.py")
    else:
        by_cfg = {f"{e['num_hashes']}/{e['bands']}": e for e in ded.get("lsh", [])}
        for key, floors in baseline.get("dedup_recall_floors", {}).items():
            e = by_cfg.get(key)
            if e is None:
                fails.append(f"dedup: LSH config {key} absent from the sweep")
                continue
            for metric, floor in floors.items():
                got = e.get(metric)
                if got is None or got < floor:
                    fails.append(f"dedup: {key} {metric} {got} < floor {floor}")
        est_by_h = {str(e["num_hashes"]): e["mae"] for e in ded.get("estimation", [])}
        for h, ceil in baseline.get("dedup_est_mae_ceilings", {}).items():
            got = est_by_h.get(h)
            if got is None or got > ceil:
                fails.append(
                    f"dedup: signature est MAE {got} at H={h} > ceiling {ceil} "
                    "(binomial theory sqrt(j(1-j)/H) plus margin)"
                )

    # ---- semantic dedup: pair-recall floors per dispatchable family -------
    # (VERDICT r10 #4: the floors ann_plan(shape="dedup") qualifies against
    # — measured in the DEDUP shape on the planted-twin harness, a
    # different quantity than the retrieval recall@10 floors above)
    sd = artifacts.get("semdedup")
    if sd is None:
        fails.append(
            "semdedup: .semdedup_quality.json missing — run tools/semdedup_quality.py"
        )
    else:
        measured = {_ann_key(e): e["pair_recall"] for e in sd.get("results", [])}
        for key, floor in baseline.get("semantic_dedup_pair_floors", {}).items():
            got = measured.get(key)
            if got is None:
                fails.append(f"semdedup: config {key!r} absent from the sweep")
            elif got < floor:
                fails.append(f"semdedup: {key} pair recall {got} < floor {floor}")
        # junk ceilings: the self-join's n^2 coefficient — the fraction of
        # UNCORRELATED pairs the banding admits as candidates. A banding
        # edit that lifts this silently re-opens the r11 quadratic blowup.
        junk = {
            _ann_key(e): e["junk_fraction"]
            for e in sd.get("results", [])
            if "junk_fraction" in e
        }
        for key, ceil in baseline.get("semantic_dedup_junk_ceilings", {}).items():
            got = junk.get(key)
            if got is None:
                fails.append(f"semdedup: junk fraction for {key!r} not measured")
            elif got > ceil:
                fails.append(
                    f"semdedup: {key} junk fraction {got} > ceiling {ceil} "
                    "(self-join candidate mass at cosine ~0)"
                )

    # ---- sketches: error/FPR ceilings + hard contracts ---------------------
    sk = artifacts.get("sketch")
    if sk is None:
        fails.append("sketch: .sketch_quality.json missing — run tools/sketch_quality.py")
    else:
        b = baseline.get("sketch", {})
        cms = sk.get("cms", {})
        if cms.get("max_over", 1e18) > cms.get("epsN", 0):
            fails.append(
                f"sketch: CMS max overestimate {cms.get('max_over')} violates "
                f"the epsilon*N bound {cms.get('epsN')}"
            )
        if "cms_mean_over_ceiling" in b and cms.get("mean_over", 1e18) > b["cms_mean_over_ceiling"]:
            fails.append(
                f"sketch: CMS mean overestimate {cms.get('mean_over')} > "
                f"ceiling {b['cms_mean_over_ceiling']}"
            )
        for e in sk.get("hll", []):
            ceil = b.get("hll_corrected_rel_err_ceiling", 0.2)
            if e.get("corrected_rel_err", 1e18) > ceil:
                fails.append(
                    f"sketch: HLL corrected rel err {e.get('corrected_rel_err')} "
                    f"({e.get('column')}) > ceiling {ceil} — the LinearCounting "
                    "small-range fix (r7) may have regressed"
                )
        for e in sk.get("hdr", []):
            if not e.get("within_contract", False):
                fails.append(f"sketch: HDR {e.get('quantile')} outside the 2^-5 bound")
        if not sk.get("gk", {}).get("within_contract", False):
            fails.append("sketch: GK rank error outside the accuracy bound")
        bloom = sk.get("bloom", {})
        ratio_ceil = b.get("bloom_fpr_theory_ratio_ceiling", 2.0)
        theory = bloom.get("theory_fpr") or 0
        if theory and bloom.get("measured_fpr", 1e18) > ratio_ceil * theory:
            fails.append(
                f"sketch: Bloom measured FPR {bloom.get('measured_fpr')} > "
                f"{ratio_ceil}x theory {theory}"
            )
    return fails


def _load(path: str):
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def main() -> None:
    do_run = "--run" in sys.argv[1:]
    sf_dir = next(
        (a for a in sys.argv[1:] if not a.startswith("--")), "/root/testdata/sf0.1"
    )
    if do_run:
        for name, script in HARNESSES.items():
            print(f"quality_assert: running {script} {sf_dir} ...", file=sys.stderr)
            rc = subprocess.call(
                [sys.executable, os.path.join(HERE, script), sf_dir],
                stdout=subprocess.DEVNULL,
            )
            if rc != 0:
                print(f"quality_assert: FAIL {script} exited {rc}", file=sys.stderr)
                sys.exit(2)
    baseline = _load(BASELINE_PATH)
    if baseline is None:
        print(f"quality_assert: cannot read {BASELINE_PATH}", file=sys.stderr)
        sys.exit(2)
    artifacts = {
        name: _load(os.path.join(REPO, fn)) for name, fn in ARTIFACTS.items()
    }
    fails = check_quality(artifacts, baseline)
    if fails:
        for f in fails:
            print(f"quality_assert: FAIL {f}", file=sys.stderr)
        sys.exit(1)
    print(
        "quality_assert: all retrieval/detection/estimation contracts hold",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
