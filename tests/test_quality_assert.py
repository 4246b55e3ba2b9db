"""Unit tests for tools/quality_assert.py's PURE verdict function
check_quality, driven without running the three quality harnesses (the
test_sf1_assert.py pattern — VERDICT r7 #3: the nonzero-exit-on-drift logic
must be unit-tested so the per-round gate cannot rot silently)."""

from __future__ import annotations

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _mod():
    spec = importlib.util.spec_from_file_location(
        "quality_assert", os.path.join(REPO, "tools", "quality_assert.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _baseline():
    with open(os.path.join(REPO, "tools", "quality_baseline.json")) as fh:
        return json.load(fh)


def _green_artifacts(baseline):
    """Artifacts that satisfy every committed contract exactly at the
    floor/ceiling boundary (contracts are inclusive)."""
    ann = {
        "results": [
            {"family": k.split("|")[0], "config": k.split("|")[1], "recall_at_10": v}
            for k, v in baseline["ann_recall_floors"].items()
        ]
    }
    dedup = {
        "lsh": [
            {
                "num_hashes": int(k.split("/")[0]),
                "bands": int(k.split("/")[1]),
                **floors,
            }
            for k, floors in baseline["dedup_recall_floors"].items()
        ],
        "estimation": [
            {"num_hashes": int(h), "mae": ceil}
            for h, ceil in baseline["dedup_est_mae_ceilings"].items()
        ],
    }
    sk = baseline["sketch"]
    sketch = {
        "cms": {"max_over": 100, "epsN": 200.0, "mean_over": sk["cms_mean_over_ceiling"]},
        "hll": [
            {"column": "dau", "corrected_rel_err": sk["hll_corrected_rel_err_ceiling"]}
        ],
        "hdr": [{"quantile": "p50", "within_contract": True}],
        "gk": {"within_contract": True},
        "bloom": {
            "measured_fpr": 0.015,
            "theory_fpr": 0.015 / sk["bloom_fpr_theory_ratio_ceiling"],
        },
    }
    junk_ceils = baseline.get("semantic_dedup_junk_ceilings", {})
    semdedup = {
        "results": [
            {
                "family": k.split("|")[0],
                "config": k.split("|")[1],
                "pair_recall": v,
                # junk exactly at the ceiling where one is committed
                **(
                    {"junk_fraction": junk_ceils[k]} if k in junk_ceils else {}
                ),
            }
            for k, v in baseline["semantic_dedup_pair_floors"].items()
        ]
    }
    return {"ann": ann, "dedup": dedup, "sketch": sketch, "semdedup": semdedup}


def test_baseline_is_committed_and_green_at_the_boundary():
    m, b = _mod(), _baseline()
    assert b["ann_recall_floors"], "ann floors must not be empty"
    assert m.check_quality(_green_artifacts(b), b) == []


def test_missing_artifact_fails():
    m, b = _mod(), _baseline()
    art = _green_artifacts(b)
    art["ann"] = None
    fails = m.check_quality(art, b)
    assert any("ann_recall.json missing" in f for f in fails)


def test_recall_below_floor_fails_and_default_marker_is_ignored():
    m, b = _mod(), _baseline()
    art = _green_artifacts(b)
    key = next(iter(b["ann_recall_floors"]))
    fam, cfg = key.split("|")
    # marker stripped: a *default*-suffixed label still matches its floor key
    art["ann"]["results"] = [
        {"family": fam, "config": cfg + " *default*",
         "recall_at_10": b["ann_recall_floors"][key] - 0.01}
    ]
    fails = m.check_quality(art, b)
    assert any(key in f and "< floor" in f for f in fails)
    # every OTHER floored config is now absent — also failures
    assert sum("absent" in f for f in fails) == len(b["ann_recall_floors"]) - 1


def test_dedup_recall_and_mae_contracts():
    m, b = _mod(), _baseline()
    art = _green_artifacts(b)
    art["dedup"]["lsh"][0]["recall_j>=0.8"] -= 0.05
    first_h = art["dedup"]["estimation"][0]
    first_h["mae"] += 0.01
    fails = m.check_quality(art, b)
    assert any("recall_j>=0.8" in f for f in fails)
    assert any("est MAE" in f for f in fails)


def test_sketch_contracts():
    m, b = _mod(), _baseline()
    art = _green_artifacts(b)
    art["sketch"]["cms"]["max_over"] = 300  # > epsN 200
    art["sketch"]["hll"][0]["corrected_rel_err"] = 0.5
    art["sketch"]["hdr"][0]["within_contract"] = False
    art["sketch"]["gk"]["within_contract"] = False
    art["sketch"]["bloom"]["measured_fpr"] = 1.0
    fails = m.check_quality(art, b)
    for needle in ("epsilon*N", "LinearCounting", "HDR", "GK", "Bloom"):
        assert any(needle in f for f in fails), needle


def test_semdedup_pair_floor_contracts():
    """The dedup-shape pair-recall floors (VERDICT r10 #4) gate like the
    retrieval floors: below-floor fails naming the config, an absent
    config fails, a missing artifact fails."""
    m, b = _mod(), _baseline()
    art = _green_artifacts(b)
    key = next(iter(b["semantic_dedup_pair_floors"]))
    art["semdedup"]["results"][0]["pair_recall"] -= 0.05
    fails = m.check_quality(art, b)
    assert any("semdedup" in f and "< floor" in f for f in fails)
    art = _green_artifacts(b)
    art["semdedup"]["results"] = art["semdedup"]["results"][1:]
    assert any("absent" in f and key in f for f in m.check_quality(art, b))
    art = _green_artifacts(b)
    art["semdedup"] = None
    assert any("semdedup_quality.json missing" in f for f in m.check_quality(art, b))
    # junk ceiling: above it fails naming the self-join mass
    art = _green_artifacts(b)
    jkey = next(iter(b["semantic_dedup_junk_ceilings"]))
    for e in art["semdedup"]["results"]:
        if f"{e['family']}|{e['config']}" == jkey:
            e["junk_fraction"] = b["semantic_dedup_junk_ceilings"][jkey] + 0.01
    assert any(
        "junk fraction" in f and "> ceiling" in f for f in m.check_quality(art, b)
    )


def test_committed_artifacts_pass_committed_baseline():
    """The repo's own committed artifacts must satisfy the committed
    contracts — if this fails, either quality regressed (fix the engine) or
    a contract knowingly changed (update the baseline in the same commit)."""
    m, b = _mod(), _baseline()
    artifacts = {
        name: json.load(open(os.path.join(REPO, fn)))
        for name, fn in m.ARTIFACTS.items()
    }
    assert m.check_quality(artifacts, b) == []
