#!/usr/bin/env python
"""Rotation-freshness audit (VERDICT r8 #4; function-span granularity
VERDICT r9 #4): for every registered gate, compare the round of its LAST
driver-green CORRECTNESS row with the git history of its implementation —
the plans/suite_*.py module that registers it plus every operators/*,
streaming/* and sources/* module its function body references. A gate whose
implementation changed in a round AFTER its last green row is STALE —
zero-debt guarantees it was verified once, not that the verified code still
runs.

File granularity overstates risk: appending a NEW operator to a shared
module flags every older gate in that file (r9 measured 80/110 flagged, most
of them same-file appends). This audit therefore diffs at FUNCTION-SPAN
granularity: for each touched file it extracts the specific top-level
functions the gate references (via its import aliases and local imports),
expands them transitively through same-module calls and module-level
constants, and AST-compares those spans between the gate's last-green
boundary commit and HEAD (docstrings stripped, comments invisible to ast).
Only a changed REFERENCED span marks the gate stale; a file that merely
gained unrelated appends is reported separately as append-only. When the
referenced names can't be resolved for a touched file, the audit falls back
to file-level (conservative, flagged).

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


def _gate_files() -> dict[str, dict[str, set[str] | None]]:
    """gate -> {implementation file -> referenced top-level names, or None
    when unresolvable (file-level fallback)}. Files come from the
    @query-decorated function's body references (operator/streaming module
    aliases + local imports) + its suite file; names are the attributes used
    through each alias (for module imports), the imported names (for
    function imports), and for the suite file the gate function itself plus
    its decorator helpers."""
    files: dict[str, dict[str, set[str] | None]] = {}
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
            dec_names: set[str] = set()
            for dec in node.decorator_list:
                if (
                    isinstance(dec, ast.Call)
                    and getattr(dec.func, "id", "") == "query"
                    and dec.args
                    and isinstance(dec.args[0], ast.Constant)
                ):
                    gate = dec.args[0].value
                    for sub in ast.walk(dec):
                        if isinstance(sub, ast.Name):
                            dec_names.add(sub.id)
            if not gate:
                continue
            body_src = ast.get_source_segment(src, node) or ""
            # suite file: the gate function itself + decorator helpers seed
            # the span walk (transitive closure picks up local helpers)
            refs: dict[str, set[str] | None] = {
                rel_suite: {node.name} | dec_names
            }

            def _add(path: str, names: set[str] | None) -> None:
                cur = refs.get(path)
                if path in refs and (cur is None or names is None):
                    refs[path] = None
                else:
                    refs[path] = (cur or set()) | (names or set())

            # local imports inside the function body
            for m in re.finditer(
                r"from payroll_etl_fastapi_spark\.(\S+) import (\w+)(?: as (\w+))?",
                body_src,
            ):
                mod = m.group(1).replace(".", "/")
                p = f"payroll_etl_fastapi_spark/{mod}.py"
                alias = m.group(3) or m.group(2)
                if os.path.exists(os.path.join(REPO, p)):
                    # module import: the used names are `alias.attr` refs
                    used = {
                        am.group(1)
                        for am in re.finditer(
                            rf"\b{re.escape(alias)}\.(\w+)", body_src
                        )
                    }
                    _add(p, used or None)
                else:
                    p2 = f"payroll_etl_fastapi_spark/{mod}/{m.group(2)}.py"
                    if os.path.exists(os.path.join(REPO, p2)):
                        # submodule import: alias IS the module
                        used = {
                            am.group(1)
                            for am in re.finditer(
                                rf"\b{re.escape(alias)}\.(\w+)", body_src
                            )
                        }
                        _add(p2, used or None)
                    else:
                        # function import from a module
                        p3 = f"payroll_etl_fastapi_spark/{mod}.py"
                        base = f"payroll_etl_fastapi_spark/{m.group(1).rsplit('.', 1)[0].replace('.', '/')}.py"
                        tgt = p3 if os.path.exists(os.path.join(REPO, p3)) else base
                        if os.path.exists(os.path.join(REPO, tgt)):
                            _add(tgt, {m.group(2)})
            for alias, f in alias_file.items():
                if re.search(rf"\b{re.escape(alias)}\.", body_src):
                    if os.path.exists(os.path.join(REPO, f)):
                        used = {
                            am.group(1)
                            for am in re.finditer(
                                rf"\b{re.escape(alias)}\.(\w+)", body_src
                            )
                        }
                        _add(f, used or None)
                elif re.search(rf"\b{re.escape(alias)}\s*\(", body_src):
                    # module-level `from mod import func` used as a call
                    if os.path.exists(os.path.join(REPO, f)):
                        _add(f, {alias})
            files[gate] = refs
    return files


def _module_spans(src: str) -> dict[str, str]:
    """Top-level name -> normalized AST dump (docstrings stripped; comments
    are invisible to ast, so comment/doc-only edits never flag)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {"__unparseable__": src}
    spans: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            body = list(node.body)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node = type(node)(  # shallow rebuild without the docstring
                    **{
                        **{f: getattr(node, f) for f in node._fields},
                        "body": body[1:] or [ast.Pass()],
                    }
                )
            spans[getattr(node, "name")] = ast.dump(node)
        elif isinstance(node, ast.Assign):
            d = ast.dump(node)
            for tgt in node.targets:
                for sub in ast.walk(tgt):
                    if isinstance(sub, ast.Name):
                        spans[sub.id] = d
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            spans[node.target.id] = ast.dump(node)
    return spans


def _span_callees(src: str) -> dict[str, set[str]]:
    """Top-level name -> module-level names its body references (the
    same-module transitive edge set)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return {}
    top = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            top.add(node.name)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                for sub in ast.walk(tgt):
                    if isinstance(sub, ast.Name):
                        top.add(sub.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            top.add(node.target.id)
    edges: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            refs = {
                sub.id
                for sub in ast.walk(node)
                if isinstance(sub, ast.Name) and sub.id in top
            }
            edges[node.name] = refs - {node.name}
    return edges


def _closure(seeds: set[str], edges: dict[str, set[str]]) -> set[str]:
    out, work = set(), list(seeds)
    while work:
        n = work.pop()
        if n in out:
            continue
        out.add(n)
        work.extend(edges.get(n, ()))
    return out


def _git_show(sha: str, path: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{sha}:{path}"], cwd=REPO, capture_output=True, text=True
    )
    return r.stdout if r.returncode == 0 else None


def _spans_changed(
    sha: str, path: str, seeds: set[str] | None
) -> tuple[bool, set[str]]:
    """Did any referenced span of `path` change between `sha` and HEAD?
    Returns (changed, changed-names). seeds=None → file-level fallback."""
    new_src_path = os.path.join(REPO, path)
    if not os.path.exists(new_src_path):
        return True, {"<file deleted>"}
    old_src = _git_show(sha, path)
    if old_src is None:
        return True, {"<file new since boundary>"}
    if seeds is None:
        return True, {"<unresolved refs: file-level>"}
    new_src = open(new_src_path).read()
    # closure over the UNION of old+new edges: catches a helper that the
    # referenced function called at either end of the diff
    edges_new = _span_callees(new_src)
    edges_old = _span_callees(old_src)
    edges = {
        k: edges_new.get(k, set()) | edges_old.get(k, set())
        for k in set(edges_new) | set(edges_old)
    }
    wanted = _closure(seeds, edges)
    spans_new = _module_spans(new_src)
    spans_old = _module_spans(old_src)
    changed = {
        n
        for n in wanted
        if spans_old.get(n) != spans_new.get(n)
        and (n in spans_old or n in spans_new)
    }
    return bool(changed), changed


def main() -> int:
    import __spark_entry__ as e

    boundaries = _boundaries()
    green = _green_rounds()
    gate_files = _gate_files()
    names = (
        list(e._WINDOW) + list(e._SECONDARY) + list(e._ARCHIVED)
        if "--all" in sys.argv
        # --emit snapshots everything the structural check cares about:
        # out-of-window gates (stale ⇒ must rotate in) plus the archived
        # set (stale ⇒ re-verify via check_oracle --archived, reported)
        else list(e._SECONDARY) + list(e._ARCHIVED)
        if "--emit" in sys.argv
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
    stale, append_only = [], []
    span_cache: dict[tuple[str, str, frozenset | None], tuple[bool, set[str]]] = {}
    for n in names:
        g = green.get(n)
        if g is None or g not in changed_since:
            continue
        refs = gate_files.get(n, {})
        touched = sorted(set(refs) & changed_since[g])
        if not touched:
            continue
        sha = boundaries[g]
        changed_detail: list[str] = []
        for path in touched:
            seeds = refs[path]
            key = (sha, path, frozenset(seeds) if seeds is not None else None)
            if key not in span_cache:
                span_cache[key] = _spans_changed(sha, path, seeds)
            ch, which = span_cache[key]
            if ch:
                changed_detail.append(f"{path}[{', '.join(sorted(which))}]")
        if changed_detail:
            stale.append((g, n, changed_detail))
        else:
            append_only.append((g, n, touched))
    stale.sort()
    append_only.sort()
    for g, n, detail in stale:
        print(f"r{g}  {n}: {'; '.join(detail)}")
    if append_only and "--quiet" not in sys.argv:
        print("\n-- fresh (referenced spans unchanged; file-append only) --")
        for g, n, touched in append_only:
            print(f"r{g}  {n}: {', '.join(touched)}")
    print(
        f"\n{len(stale)} stale of {len(names)} audited "
        f"({len(append_only)} reclassified append-only fresh)"
    )
    if "--emit" in sys.argv:
        # Committed snapshot feeding __spark_entry__._check_registry's
        # structural span-freshness invariant (VERDICT r10 #2): a stale
        # gate sitting OUTSIDE the window fails the import, so the r10
        # fourth-wave mistake (rotating a span-stale gate out) cannot
        # recur silently. Re-emit at round end, after all code lands.
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
        ).stdout.strip()
        snap = {
            "head": head,
            "audited": len(names),
            "stale": sorted(n for _g, n, _d in stale),
            "archived_stale": sorted(
                n for _g, n, _d in stale if n in e._ARCHIVED
            ),
        }
        path = os.path.join(REPO, "tools", "staleness_snapshot.json")
        with open(path, "w") as fh:
            json.dump(snap, fh, indent=1, sort_keys=True)
        print(f"emitted {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
