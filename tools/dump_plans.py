#!/usr/bin/env python
"""Dump .explain('formatted') for named gates to plans/r13/<gate>_<tag>.txt
(the judge-facing plan evidence; guide §1 / §7.2).

Usage: python tools/dump_plans.py <tag> <gate> [<gate> ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    tag, gates = argv[0], argv[1:]
    spark = get_spark("plans")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in gates:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
