#!/usr/bin/env python
"""Per-job profiler for single gates (guide §1: measure first).

Runs the named gates exactly as bench.py does (warmed inputs, GC between
gates, setup/exec split) with Spark event logging on, then parses the event
log into per-job wall times — the local[32] stand-in for the Spark UI's
Jobs page (spark.ui.enabled is false in this sandbox). Prints, per gate:

    setup/exec seconds, then every Spark job it launched with duration and
    the active job description / callsite.

Usage: python tools/profile_gate.py <gate> [<gate> ...] [--sf DIR] [--passes N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    passes = 1
    args: list[str] = []
    skip = False
    for i, a in enumerate(sys.argv[1:], start=1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif a == "--passes":
            passes = int(sys.argv[i + 1])
            skip = True
        else:
            args.append(a)
    import shutil

    evdir = "/tmp/spark-events-profile"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    for root, _dirs, files in os.walk(sf_dir):
        for fname in files:
            if fname.endswith(".parquet"):
                with open(os.path.join(root, fname), "rb") as fh:
                    while fh.read(1 << 22):
                        pass

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    marks: list[tuple[str, str, float, float, float]] = []
    for p in range(passes):
        for name in args:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            wall0 = time.time() * 1000
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            wall1 = time.time() * 1000
            marks.append((name, f"pass{p}", wall0, wall1, t1 - t0))
            print(
                f"== {name} pass{p}: setup {t1 - t0:.2f}s exec {t2 - t1:.2f}s "
                f"total {t2 - t0:.2f}s"
            )
    spark.stop()  # flush the event log

    stages: dict[int, dict] = {}
    ev_files = []
    for root, _dirs, files in os.walk(evdir):
        ev_files.extend(
            os.path.join(root, f) for f in files if "appstatus" not in f
        )
    jobs: dict[int, dict] = {}
    for path in ev_files:
        with open(path) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if e.get("Event") == "SparkListenerJobStart":
                    props = e.get("Properties") or {}
                    jobs[e["Job ID"]] = {
                        "t0": e["Submission Time"],
                        "desc": props.get("spark.job.description")
                        or (e.get("Stage Infos") or [{}])[-1].get("Stage Name", ""),
                        "nstages": len(e.get("Stage IDs", [])),
                        "stage_ids": e.get("Stage IDs", []),
                    }
                elif e.get("Event") == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["t1"] = e["Completion Time"]
                elif e.get("Event") == "SparkListenerStageCompleted":
                    info = e.get("Stage Info", {})
                    sid = info.get("Stage ID")
                    stages[sid] = {
                        "name": info.get("Stage Name", ""),
                        "ntasks": info.get("Number of Tasks", 0),
                        "t0": info.get("Submission Time", 0),
                        "t1": info.get("Completion Time", 0),
                        "details": (info.get("Details") or "").split("\n")[:4],
                    }
    for name, tag, w0, w1, setup in marks:
        mine = {
            jid: j
            for jid, j in jobs.items()
            if "t1" in j and w0 <= j["t0"] <= w1
        }
        print(f"\n-- {name} {tag}: {len(mine)} jobs "
              f"(job-time sum {sum(j['t1'] - j['t0'] for j in mine.values()) / 1000:.2f}s)")
        for jid in sorted(mine):
            j = mine[jid]
            dur = (j["t1"] - j["t0"]) / 1000
            print(
                f"  job {jid:>4}  {dur:6.2f}s  "
                f"stages={j['nstages']:<3} {str(j['desc'])[:110]}"
            )
            if dur >= 0.5:
                for sid in j.get("stage_ids", []):
                    s = stages.get(sid)
                    if not s or not s.get("t1"):
                        continue
                    print(
                        f"      stage {sid:>4} {(s['t1'] - s['t0']) / 1000:6.2f}s "
                        f"tasks={s['ntasks']:<4} {s['name'][:90]}"
                    )
                    for d in s["details"][1:3]:
                        print(f"        {d[:100]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
