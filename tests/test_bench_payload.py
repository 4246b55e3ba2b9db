"""The bench's one-line stdout payload (VERDICT r12 #1): it must carry REAL
per-query name→seconds entries — never synthetic keys like "n" — and the
whole line must fit the driver's 2000-char tail capture regardless of how
many gates the registry holds."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

_BASE = {
    "metric": "suite_seconds",
    "value": 324.1,
    "estimator": "min_of_2",
    "methodology": "v2-warm",
    "warmed_inputs": True,
    "first_pass_total": 416.0,
    "median_total": 378.7,
    "unit": "sec",
    "sf": 0.1,
}


def _timings(n: int) -> dict[str, float | None]:
    # realistic name lengths (the registry's avg is ~22 chars)
    return {f"gate_with_a_long_name_{i:04d}": 0.1 + i * 0.05 for i in range(n)}


def test_full_registry_line_fits_tail_capture():
    timings = _timings(164)
    line = bench._build_payload(_BASE, timings)
    assert len(line) <= bench._LINE_BUDGET
    payload = json.loads(line)
    # the most expensive gates are the ones kept
    kept = payload["queries"]
    ranked = sorted(timings, key=lambda n: -timings[n])
    assert list(kept) == ranked[: len(kept)]
    assert payload["n_queries"] == 164
    assert payload["n_omitted"] == 164 - len(kept)
    assert len(kept) >= 40  # enough for the driver's per-query PERF diff


def test_no_synthetic_query_keys():
    payload = json.loads(bench._build_payload(_BASE, _timings(164)))
    assert "n" not in payload["queries"]
    assert "detail" not in payload["queries"]
    assert all(k.startswith("gate_with_a_long_name_") for k in payload["queries"])


def test_small_suite_keeps_every_entry():
    timings = _timings(12)
    payload = json.loads(bench._build_payload(_BASE, timings))
    assert set(payload["queries"]) == set(timings)
    assert "n_omitted" not in payload
    # rounded to 0.01 s
    assert payload["queries"]["gate_with_a_long_name_0011"] == round(
        timings["gate_with_a_long_name_0011"], 2
    )


def test_failed_queries_excluded_from_map():
    timings = _timings(10)
    timings["broken_gate"] = None
    base = dict(_BASE, failed=["broken_gate"])
    payload = json.loads(bench._build_payload(base, timings))
    assert "broken_gate" not in payload["queries"]
    assert payload["failed"] == ["broken_gate"]
    assert payload["n_queries"] == 11
