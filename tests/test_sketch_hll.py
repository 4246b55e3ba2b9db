"""HyperLogLog sketch (operators/sketch.py hll_*): register construction
vs a Python replica, lossless merge, estimator accuracy at raw-HLL error
bounds, and determinism of the scaled-integer harmonic sum."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import sketch as SK


def _py_register(keys) -> dict[int, int]:
    reg: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:7], 16)
        bucket, w = h % SK.HLL_M, h >> SK.HLL_P
        rho = SK.HLL_WBITS + 1 if w == 0 else SK.HLL_WBITS + 1 - w.bit_length()
        reg[bucket] = max(reg.get(bucket, 0), rho)
    return reg


def test_registers_match_python_replica(spark):
    keys = [str(i) for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        (r.bucket, r.rho) for r in SK.hll_registers(df, "k").collect()
    }
    assert got == set(_py_register(keys).items())


def test_merge_is_lossless(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    whole = SK.hll_registers(df, "k")
    a = SK.hll_registers(df.filter(F.col("k") % 2 == 0), "k")
    b = SK.hll_registers(df.filter(F.col("k") % 2 == 1), "k")
    merged = SK.hll_merge(a, b)
    assert {(r.bucket, r.rho) for r in merged.collect()} == {
        (r.bucket, r.rho) for r in whole.collect()
    }
    # and the merged estimate equals the single-pass estimate exactly
    e1 = SK.hll_estimate(whole).collect()[0]
    e2 = SK.hll_estimate(merged).collect()[0]
    assert (e1.hll_est, e1.n_buckets_used) == (e2.hll_est, e2.n_buckets_used)


def test_estimate_within_raw_hll_error(spark):
    # raw HLL at m=256: relative error ~1.04/sqrt(256) = 6.5%; allow 4 sigma
    for n in (2000, 10000):
        df = spark.createDataFrame([(f"key{i}",) for i in range(n)], "k string")
        est = SK.hll_estimate(SK.hll_registers(df, "k")).collect()[0].hll_est
        assert abs(est - n) / n < 0.26, (n, est)


def test_estimate_matches_python_formula(spark):
    keys = [str(i) for i in range(3000)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    reg = _py_register(keys)
    scale = 1 << (SK.HLL_WBITS + 1)
    s_int = sum(1 << (SK.HLL_WBITS + 1 - r) for r in reg.values()) + (
        SK.HLL_M - len(reg)
    ) * scale
    import math

    expect = math.floor(2.0 * SK.hll_alpha_m2() / float(s_int) * 1e6 + 0.5) / 1e6
    got = SK.hll_estimate(SK.hll_registers(df, "k")).collect()[0]
    assert got.hll_est == expect
    assert got.n_buckets_used == len(reg)


def test_rolling_hll_window_merge_equals_single_pass(spark):
    """The rolled (×7 register fan-out + bucket-max) registers must equal
    the single-pass registers of the true trailing window — HLL merge is
    lossless, so rolling_hll_distinct's WAU estimate is EXACTLY the
    estimate a from-scratch sketch of the 7-day window would give."""
    import datetime as dt

    from payroll_etl_fastapi_spark.operators.timeseries import rolling_hll_distinct

    base = dt.datetime(2025, 3, 1)
    rows = []
    # 10 days, each day d has users [d*400 .. d*400 + 1000) -> overlapping
    # sets, cardinalities inside the raw estimator's valid range (> 2.5m)
    for d in range(10):
        for u in range(d * 400, d * 400 + 1000):
            rows.append((dt.datetime.fromordinal(base.toordinal() + d), f"u{u}"))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id string")
    out = {r.day: r for r in rolling_hll_distinct(ev, "user_id", "ts").collect()}
    assert len(out) == 10

    for probe in (0, 3, 9):
        day = (base + dt.timedelta(days=probe)).date()
        lo = day - dt.timedelta(days=6)
        windowed = ev.filter(
            (F.col("ts").cast("date") >= F.lit(lo))
            & (F.col("ts").cast("date") <= F.lit(day))
        )
        single = SK.hll_estimate(SK.hll_registers(windowed, "user_id")).collect()[0]
        assert out[day].wau_est == single.hll_est, probe

    # estimates track the exact counts within raw-HLL error (~6.5% at m=256;
    # allow 3 sigma)
    exact_day0 = 1000
    assert abs(out[base.date()].dau_est - exact_day0) / exact_day0 < 0.25


def test_rolling_hll_gap_day_emits_only_active_days(spark):
    """A day with ZERO events must not appear in the output, even though the
    7-day register fan-out from earlier active days reaches it (the WAU
    registers exist, the DAU slice is all-NULL). Regression pin for the
    round-6 fix: pre-fix, gap days surfaced with a bogus empty-register
    dau_est (~184) and diverged from the inner-join SQL oracle."""
    import datetime as dt

    from payroll_etl_fastapi_spark.operators.timeseries import rolling_hll_distinct

    rows = []
    # active on days 0, 1 and 5 — days 2,3,4 are gaps INSIDE the fan-out
    # horizon of days 0-1, day 6+ is past max_day
    for d in (0, 1, 5):
        for u in range(800):
            rows.append((dt.datetime(2025, 6, 1 + d, 12), f"u{d}_{u}"))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id string")
    out = {r.day: r for r in rolling_hll_distinct(ev, "user_id", "ts").collect()}
    assert sorted(d.day for d in out) == [1, 2, 6]  # June 1, 2, 6 only
    # gap days carried no DAU slice; active days carry sane estimates
    for r in out.values():
        assert r.dau_est > 400  # ~800 true, raw-HLL error << 50%
    # day 6's WAU window [May 31..Jun 6] covers days 1 and 5 -> ~1600 users
    assert out[dt.date(2025, 6, 6)].wau_est > out[dt.date(2025, 6, 6)].dau_est


def test_rolling_hll_corrected_fixes_small_dau_bias(spark):
    """Accuracy floor (round 7, measured in PLANS.md §sketch accuracy): at
    DAU ~130 with m = 256 registers the RAW rolling estimator reported
    ~2x truth (91% mean error at sf0.01) while staying oracle-green —
    determinism can't see estimator bias. corrected=True applies
    LinearCounting per day/window: mean error back to ~3%. In the design
    range (>= 2.5m) corrected is the identical expression (pinned at
    sf0.1-like cardinality by construction: LC only fires when the raw
    estimate is <= 2.5m and empty registers exist)."""
    import datetime

    from payroll_etl_fastapi_spark.operators import timeseries as TS

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (base + datetime.timedelta(days=d, seconds=u), f"user{u}")
        for d in range(10)
        for u in range(120)  # 120 true DAU << 2.5 * 256
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, user_id string")
    raw = {r.day: r.dau_est for r in TS.rolling_hll_distinct(
        ev, "user_id", "ts").collect()}
    corr = {r.day: r.dau_est for r in TS.rolling_hll_distinct(
        ev, "user_id", "ts", corrected=True).collect()}
    for day, est in corr.items():
        assert abs(est - 120) / 120 < 0.15, (day, est)
    # and the raw bias this exists to fix is real on the same registers
    assert all(est > 120 * 1.3 for est in raw.values())
