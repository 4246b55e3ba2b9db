#!/usr/bin/env python
"""Generate the round-notes bench section FROM committed bench artifacts
(VERDICT r11 #3: r11's notes quoted an uncommitted 337.7 s sample while the
committed detail said 353.2 s with two >25%-regressions — from now on the
notes paragraph is tool-emitted and can only describe the artifact).

Usage:
    python tools/bench_report.py NEW_DETAIL.json [OLD_DETAIL.json]

OLD may be a file path or ``git:<ref>`` (e.g. git:HEAD, git:a118170 —
resolved via `git show <ref>:BENCH_DETAIL.json`). Prints, markdown-ready:
total / first-pass / median, the common-subset ratio vs OLD, and every
query that regressed >25% AND >1 s (the builder's own regression rule),
plus the top improvements.
"""

from __future__ import annotations

import json
import subprocess
import sys


def _load(arg: str):
    if arg.startswith("git:"):
        out = subprocess.run(
            ["git", "show", f"{arg[4:]}:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    with open(arg) as fh:
        return json.load(fh)


def main() -> int:
    new = _load(sys.argv[1])
    old = _load(sys.argv[2]) if len(sys.argv) > 2 else None
    nq = {k: v for k, v in new["queries"].items() if v is not None}
    print(
        f"Bench ({new.get('methodology')}, {new.get('estimator')}, "
        f"sf={new.get('sf')}): **{new['value']:.1f} s** over {len(nq)} gates "
        f"(first-pass {new.get('first_pass_total', 0):.1f}, "
        f"median {new.get('median_total', 0):.1f})."
    )
    if new.get("failed"):
        print(f"FAILED queries: {new['failed']}")
    if old is None:
        return 0
    oq = {k: v for k, v in old["queries"].items() if v is not None}
    common = sorted(set(nq) & set(oq))
    ns, os_ = sum(nq[k] for k in common), sum(oq[k] for k in common)
    print(
        f"Common-{len(common)} subset vs the reference detail "
        f"({old['value']:.1f} s total): {ns:.1f} s vs {os_:.1f} s = "
        f"**{ns / os_:.3f}x**."
    )
    regs = [
        (nq[k] / oq[k], oq[k], nq[k], k)
        for k in common
        if nq[k] > oq[k] * 1.25 and nq[k] - oq[k] > 1.0
    ]
    if regs:
        print(f"\nRegressions >25% & >1 s ({len(regs)}):")
        for r, o, n, k in sorted(regs, reverse=True):
            print(f"- `{k}`: {o:.2f} -> {n:.2f} s ({r:.2f}x)")
    else:
        print("\nZero queries regressed >25% & >1 s.")
    imps = sorted(
        ((oq[k] - nq[k], oq[k], nq[k], k) for k in common), reverse=True
    )[:12]
    print("\nLargest improvements:")
    for d, o, n, k in imps:
        if d <= 0.3:
            break
        print(f"- `{k}`: {o:.2f} -> {n:.2f} s (-{d:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
