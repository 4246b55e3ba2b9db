"""tools/sf1_validate.py --assert verdict logic (VERDICT r6 #5): the pure
check_asserts function, driven without a 20-minute sf1 run. The real run is
executed once per round (`python tools/sf1_validate.py all --assert`) and its
log committed as .sf1_validate_r{N}.log."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "sf1_validate", os.path.join(REPO, "tools", "sf1_validate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_baseline_file_is_committed_and_covers_default_gates():
    mod = _load_mod()
    with open(mod.BASELINE_PATH) as fh:
        baseline = json.load(fh)["gates"]
    # every default gate either has a committed baseline or is a new gate
    # awaiting its first committed run (at most a handful at any time)
    missing = [n for n in mod.DEFAULT_GATES if n not in baseline]
    assert len(missing) <= 3, f"too many gates missing sf1 baselines: {missing}"


def test_check_asserts_flags_growth_and_baseline_regressions(capsys):
    mod = _load_mod()
    with open(mod.BASELINE_PATH) as fh:
        baseline = json.load(fh)["gates"]
    some_gate = next(n for n in baseline if not n.startswith("_"))
    base_sec = baseline[some_gate]["sf1_sec"]

    # green: within growth and baseline limits
    ok = {some_gate: {"sf1": {"sec": base_sec}, "growth": 2.0}}
    assert mod.check_asserts(ok) == []

    # growth breach on a non-exempt gate
    bad_growth = {some_gate: {"sf1": {"sec": base_sec}, "growth": 11.0}}
    fails = mod.check_asserts(bad_growth)
    assert len(fails) == 1 and "growth" in fails[0]

    # the fixed-k SemDeDup gate is growth-exempt by contract
    exempt = {"dedup_semantic_clusters": {"sf1": {"sec": 0.01}, "growth": 32.0}}
    assert all("growth" not in f for f in mod.check_asserts(exempt))

    # baseline-deviation breach (must clear BOTH the ratio and the absolute
    # noise floor — pick a gate big enough that doubling exceeds the floor)
    big_gate = next(
        n for n in baseline
        if not n.startswith("_") and baseline[n]["sf1_sec"] > mod.MIN_ABS_EXCESS
    )
    big_sec = baseline[big_gate]["sf1_sec"]
    slow = {big_gate: {"sf1": {"sec": big_sec * 2.0}, "growth": 2.0}}
    fails = mod.check_asserts(slow)
    assert len(fails) == 1 and "committed" in fails[0]

    # sub-second absolute deltas on small gates are the instrument's noise
    # floor (page-cache/JVM state), not regressions — ratio alone must not
    # fail a gate whose absolute excess is under MIN_ABS_EXCESS.
    # synthetic: committed 1.0s, measured 1.8s → ratio 1.8x but delta 0.8s
    tiny = {"_tiny_probe": {"sf1": {"sec": 1.8}, "growth": 2.0}}
    import json as _json

    committed = _json.load(open(mod.BASELINE_PATH))
    committed["gates"]["_tiny_probe"] = {"growth": 1.0, "sf1_sec": 1.0}
    tmp = mod.BASELINE_PATH + ".test"
    with open(tmp, "w") as fh:
        _json.dump(committed, fh)
    orig = mod.BASELINE_PATH
    try:
        mod.BASELINE_PATH = tmp
        assert mod.check_asserts(tiny) == []
        over = {"_tiny_probe": {"sf1": {"sec": 2.3}, "growth": 1.0}}
        fails = mod.check_asserts(over)  # ratio 2.3x AND delta 1.3s → fails
        assert len(fails) == 1 and "abs floor" in fails[0]
    finally:
        mod.BASELINE_PATH = orig
        os.remove(tmp)

    # unknown gate: warns (stderr note), never fails
    new = {"brand_new_gate": {"sf1": {"sec": 99.0}, "growth": 9.0}}
    assert mod.check_asserts(new) == []
    assert "no committed baseline entry" in capsys.readouterr().err
