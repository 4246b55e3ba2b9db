#!/usr/bin/env python
"""Rotation-freshness audit (VERDICT r8 #4): for every registered gate,
compare the round of its LAST driver-green CORRECTNESS row with the git
history of its implementation files (the plans/suite_*.py module that
registers it plus every operators/* and streaming/* module its function
body references). A gate whose implementation changed in a round AFTER its
last green row is STALE — zero-debt guarantees it was verified once, not
that the verified code still runs. Prints gates ranked by staleness; the
round's rotation swaps the worst into the driver window.

Usage: python tools/staleness.py [--all]   (default: _SECONDARY only)
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# boundary commit that CLOSES round N (the driver's "round N: verdict" commit
# holds CORRECTNESS_rN; code verified in round N predates it)
def _boundaries() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    b = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m:
            b[int(m.group(2))] = m.group(1)
    return b


def _green_rounds() -> dict[str, int]:
    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        rows = json.load(open(path))
        for name, r in rows.items():
            if (
                r.get("err") is None
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match", True)
            ):
                green[name] = max(green.get(name, 0), rnd)
    return green


def _gate_files() -> dict[str, set[str]]:
    """gate -> implementation files, from the @query-decorated function's
    body references (operator/streaming module aliases) + its suite file."""
    files: dict[str, set[str]] = {}
    for suite_path in glob.glob(
        os.path.join(REPO, "payroll_etl_fastapi_spark", "plans", "suite*.py")
    ):
        src = open(suite_path).read()
        tree = ast.parse(src)
        rel_suite = os.path.relpath(suite_path, REPO)
        # module-alias -> package-relative file, from all imports in module
        alias_file: dict[str, str] = {}

        def record(mod: str, alias: str):
            parts = mod.split(".")
            if "operators" in parts or "streaming" in parts or "sources" in parts:
                alias_file[alias] = (
                    os.path.join(*parts) + ".py" if parts[0] == "payroll_etl_fastapi_spark"
                    else os.path.join("payroll_etl_fastapi_spark", *parts) + ".py"
                )

        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module:
                for a in node.names:
                    full = f"{node.module}.{a.name}"
                    # "from ...operators import dedup as D" -> module file
                    cand = os.path.join(*full.split(".")) + ".py"
                    if os.path.exists(os.path.join(REPO, cand)):
                        record(full, a.asname or a.name)
                    else:
                        record(node.module, a.asname or a.name)
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            gate = None
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    gate = dec.args[0].value
            if not gate:
                continue
            refs = {rel_suite}
            body_src = ast.get_source_segment(src, node) or ""
            # local imports inside the function body
            for m in re.finditer(
                r"from payroll_etl_fastapi_spark\.(\S+) import (\w+)(?: as (\w+))?",
                body_src,
            ):
                mod = m.group(1).replace(".", "/")
                p = f"payroll_etl_fastapi_spark/{mod}.py"
                if os.path.exists(os.path.join(REPO, p)):
                    refs.add(p)
                else:
                    p2 = f"payroll_etl_fastapi_spark/{mod}/{m.group(2)}.py"
                    if os.path.exists(os.path.join(REPO, p2)):
                        refs.add(p2)
            for alias, f in alias_file.items():
                if re.search(rf"\b{re.escape(alias)}\.", body_src):
                    if os.path.exists(os.path.join(REPO, f)):
                        refs.add(f)
            files[gate] = refs
    return files


def main() -> int:
    import __spark_entry__ as e

    boundaries = _boundaries()
    green = _green_rounds()
    gate_files = _gate_files()
    names = (
        list(e._WINDOW) + list(e._SECONDARY) + list(e._ARCHIVED)
        if "--all" in sys.argv
        else list(e._SECONDARY)
    )
    changed_since: dict[int, set[str]] = {}
    for rnd, sha in boundaries.items():
        out = subprocess.run(
            ["git", "diff", "--name-only", f"{sha}..HEAD"],
            cwd=REPO,
            capture_output=True,
            text=True,
        ).stdout
        changed_since[rnd] = set(out.splitlines())
    stale = []
    for n in names:
        g = green.get(n)
        if g is None or g not in changed_since:
            continue
        touched = sorted(gate_files.get(n, set()) & changed_since[g])
        if touched:
            stale.append((g, n, touched))
    stale.sort()
    for g, n, touched in stale:
        print(f"r{g}  {n}: {', '.join(touched)}")
    print(f"\n{len(stale)} stale of {len(names)} audited")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
