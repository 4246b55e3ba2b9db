#!/usr/bin/env python
"""Skew stress at sf1 volume (VERDICT r5 #6).

The salting/AQE story is plan-pinned (tests/test_plan_shapes.py) and
measured only on synthetic sf0.1 frames; this harness measures it under a
deliberately hostile key distribution at sf1-and-beyond volume:

- FACT: the sf1 events table fanned out ×``--fanout`` (default 10 → ~10M
  rows), with 25% of all rows remapped to ONE hot user (zipf-head shape:
  "hot key ≥ 20% of rows").
- ROLLUP: per-user integer-cents sum, one-stage groupBy vs
  operators/skew.salted_sum — the salted plan bounds the hot key's rows
  per task at 1/salt_buckets.
- JOIN: fact ⋈ per-user dim (too big to broadcast at a forced 1 MB
  threshold, so it must sort-merge) — AQE skew-join ON vs OFF, with the
  executed plan checked for the ``skew=true`` marker AQE stamps on the
  split sort-merge join.

Prints one JSON line; recorded in PLANS.md §skew.

Usage: python tools/skew_stress.py [sf1_dir] [--fanout N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from payroll_etl_fastapi_spark.operators.skew import salted_sum  # noqa: E402

OFF = 100_000_000  # sf1 per-copy id shift (tools/sf1_validate.py)


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def skewed_fact(spark, sf1_dir: str, fanout: int) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf1_dir, "events.parquet"))
    fact = ev.select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(fanout))))
    # deterministic 25% of rows → user 0 (the zipf head); remaining rows keep
    # their organic long-tail user
    return fact.withColumn(
        "user_id",
        F.when(F.pmod(F.xxhash64("event_id", "rep"), F.lit(4)) == 0, F.lit(0)).otherwise(
            F.col("user_id")
        ),
    ).select(
        (F.col("event_id") * fanout + F.col("rep")).alias("event_id"),
        "user_id",
        "cents",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf1_dir", nargs="?", default="/tmp/spark_graft_sf1")
    ap.add_argument("--fanout", type=int, default=10)
    args = ap.parse_args()

    from payroll_etl_fastapi_spark.session import get_spark

    spark = get_spark("skew-stress")
    spark.range(1000).selectExpr("sum(id)").collect()

    fact = skewed_fact(spark, args.sf1_dir, args.fanout)
    n_rows = fact.count()
    hot = fact.filter(F.col("user_id") == 0).count()
    print(
        f"skew: fact {n_rows} rows, hot key {hot} ({100 * hot / n_rows:.1f}%)",
        file=sys.stderr,
    )
    out: dict = {"fact_rows": n_rows, "hot_fraction": round(hot / n_rows, 4)}

    # --- rollup: one-stage groupBy vs salted two-stage --------------------
    def plain():
        return fact.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
        ).count()

    def salted():
        return salted_sum(
            fact.withColumn("one", F.lit(1).cast("long")),
            ["user_id"],
            {"one": "n", "cents": "c"},
            salt_buckets=32,
        ).count()

    for name, fn in (("rollup_unsalted", plain), ("rollup_salted", salted)):
        spark.sparkContext._jvm.System.gc()
        sec, n = timed(fn)
        out[name] = {"sec": sec, "groups": n}
        print(f"skew: {name}: {sec}s ({n} groups)", file=sys.stderr)

    # --- join: sort-merge under skew, AQE skew-split on vs off ------------
    # The dim is a full user-PROFILE universe (20M keys, ~100× the active
    # keyset) — the 100 TB shape where the dim genuinely cannot broadcast.
    # A tiny active-keys-only dim is the wrong simulation twice over: it
    # would broadcast in production (no skew problem exists), and its
    # near-empty shuffle partitions keep AQE's skew rule from engaging.
    # 200k profile keys per copy-range (covering every fact user id) = 2M
    # rows, built WITHOUT a distinct: a pre-aggregated dim arrives at the
    # join already hash-partitioned on the key, and AQE's skew rule only
    # splits joins whose children are bare shuffle stages — which is also
    # the honest production shape (a profile table scan, not an agg). Kept
    # to ~2M rows so the SKEWED side dominates the join cost (a dim an
    # order of magnitude larger drowns the skew effect in its own sort).
    ranges = [
        spark.range(i * OFF, i * OFF + 200_000).select(
            F.col("id").alias("user_id")
        )
        for i in range(10)
    ]
    dim = ranges[0]
    for r in ranges[1:]:
        dim = dim.unionByName(r)
    dim = dim.select(
        "user_id", F.md5(F.col("user_id").cast("string")).alias("segment")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def join_run():
        j = fact.join(dim, "user_id")
        agg = j.groupBy("segment").agg(F.sum("cents").alias("c"))
        # collect the SAME DataFrame whose plan we inspect: .count() builds
        # its own plan, leaving agg's queryExecution un-executed
        # (isFinalPlan=false) and the skew marker invisible
        n = len(agg.collect())
        return n, agg

    results_plan: dict[str, str] = {}
    try:
        # broadcast disabled outright: the sf1 dim (15k users) is tiny, but
        # the case under test is the 100 TB one where the dim CANNOT be
        # broadcast — the join must sort-merge on the skewed key
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # scale the skew-split thresholds to the test volume: the hot
        # partition here is ~50 MB, under the 256 MB production default —
        # at 100 TB the same 25%-hot distribution exceeds the default by
        # orders of magnitude, so triggering at (8 MB, 2 MB advisory) is the
        # proportional re-creation of the production decision, not a cheat
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            str(8 * 1024 * 1024),
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(2 * 1024 * 1024)
        )
        for label, aqe_skew in (("join_aqe_skew_on", "true"), ("join_aqe_skew_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe_skew)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n, agg = join_run()
            sec = round(time.perf_counter() - t0, 2)
            plan = agg._jdf.queryExecution().executedPlan().toString()
            has_skew_marker = "skew=true" in plan
            out[label] = {"sec": sec, "groups": n, "skew_split_in_plan": has_skew_marker}
            results_plan[label] = plan
            print(
                f"skew: {label}: {sec}s (skew marker: {has_skew_marker})",
                file=sys.stderr,
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
