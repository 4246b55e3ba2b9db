"""Resample + gap-fill + LOCF (operators/timeseries.py): grid generation,
fill semantics, flag accounting, and the bounded-partition window."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import timeseries as TS


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, h, m), v) for u, h, m, v in rows],
        "user_id long, ts timestamp, value long",
    )


def test_gapfill_locf_semantics(spark):
    rows = [
        (1, 0, 5, 10), (1, 0, 40, 20),   # hour 0: two events, sum 30
        (1, 3, 0, 7),                    # hours 1-2 are gaps, hour 3 has 7
        (2, 5, 0, 1),                    # single-bucket key: no gaps
    ]
    out = {
        (r.key, r.bt.hour): r
        for r in TS.resample_locf(
            _ev(spark, rows), "user_id", "ts", F.sum("value"), "hour"
        ).collect()
    }
    assert {(k, h) for k, h in out} == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 5)}
    assert out[(1, 0)].v == 30 and out[(1, 0)].n_events == 2 and not out[(1, 0)].is_gap
    assert out[(1, 1)].v == 30 and out[(1, 1)].n_events == 0 and out[(1, 1)].is_gap
    assert out[(1, 2)].v == 30 and out[(1, 2)].is_gap
    assert out[(1, 3)].v == 7 and not out[(1, 3)].is_gap
    assert out[(2, 5)].v == 1 and not out[(2, 5)].is_gap


def test_gapfill_window_is_partitioned(spark):
    # the LOCF window must be keyed — a bare global window would trip the
    # package-wide bounded-window audit AND serialize the whole grid
    df = _ev(spark, [(1, 0, 0, 1), (2, 1, 0, 2)])
    plan = (
        TS.resample_locf(df, "user_id", "ts", F.sum("value"), "hour")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in plan
    import re
    # every Window operator in the plan carries a partition spec on key
    for m in re.finditer(r"Window \[[^\]]*\], \[(.*?)\]", plan):
        assert "key" in m.group(1)


def _iv(spark, rows):
    """rows: (key, start, end, id)."""
    return spark.createDataFrame(
        rows, "key long, start long, end long, id long"
    )


def test_merge_intervals_overlap_touch_and_gap(spark):
    """Overlapping intervals fuse, touching (start == prev end) intervals
    fuse, a strict gap opens a new island — per key, independently."""
    iv = _iv(
        spark,
        [
            (1, 0, 10, 1),    # island 1
            (1, 5, 8, 2),     # contained → island 1
            (1, 10, 20, 3),   # touches end=10 → island 1
            (1, 25, 30, 4),   # gap → island 2
            (2, 0, 1, 5),     # other key unaffected
        ],
    )
    out = {
        (r["key"], r["island"]): (r["start"], r["end"], r["n_intervals"])
        for r in TS.merge_intervals(iv, "key", "start", "end", "id").collect()
    }
    assert out == {
        (1, 1): (0, 20, 3),
        (1, 2): (25, 30, 1),
        (2, 1): (0, 1, 1),
    }


def test_merge_intervals_long_interval_swallows_later_starts(spark):
    """The extent-overlap semantics sessionization can't express: a long
    interval fuses later intervals that START before it ENDS even when the
    gap between their STARTS is large."""
    iv = _iv(spark, [(1, 0, 100, 1), (1, 90, 95, 2), (1, 99, 150, 3)])
    rows = TS.merge_intervals(iv, "key", "start", "end", "id").collect()
    assert len(rows) == 1
    assert (rows[0]["start"], rows[0]["end"], rows[0]["n_intervals"]) == (0, 150, 3)


def test_merge_intervals_unsorted_input_and_equal_starts(spark):
    """Input order is irrelevant (the window sorts); equal starts are
    deterministic via the (end, tiebreak) ordering."""
    iv = _iv(spark, [(1, 50, 60, 9), (1, 0, 10, 2), (1, 0, 5, 1), (1, 8, 20, 3)])
    rows = sorted(
        TS.merge_intervals(iv, "key", "start", "end", "id").collect(),
        key=lambda r: r["island"],
    )
    assert [(r["start"], r["end"], r["n_intervals"]) for r in rows] == [
        (0, 20, 3),
        (50, 60, 1),
    ]


def test_merge_intervals_empty_input(spark):
    iv = _iv(spark, []).filter(F.lit(False))
    assert TS.merge_intervals(iv, "key", "start", "end", "id").count() == 0


def test_ewma_fold_exact_integer_recurrence(spark):
    """The fold replays the sequential recurrence exactly, in order-col
    order regardless of input order; a single observation returns itself."""
    df = spark.createDataFrame(
        [(1, 2, 9), (1, 0, 1), (1, 1, 5), (2, 0, 7)],
        "k long, o long, v long",
    )
    got = {
        r["k"]: (r["n_obs"], r["ewma"])
        for r in TS.ewma_fold(df, ["k"], "o", "v").collect()
    }
    # key 1 ordered values [1, 5, 9]: s=1 → (1+5)//2=3 → (3+9)//2=6
    assert got == {1: (3, 6), 2: (1, 7)}


def test_ewma_fold_partition_layout_independent(spark):
    """Repartitioning the input does not change the fold (array_sort makes
    the collected order canonical)."""
    rows = [(1, o, (o * 37) % 101) for o in range(24)]
    df = spark.createDataFrame(rows, "k long, o long, v long")
    a = TS.ewma_fold(df, ["k"], "o", "v").collect()[0]["ewma"]
    b = TS.ewma_fold(df.repartition(13), ["k"], "o", "v").collect()[0]["ewma"]
    s = rows[0][2]
    for _, _, v in rows[1:]:
        s = (s + v) // 2
    assert a == b == s


# ---------------------------------------------------------------------------
# round 9: classical seasonal decomposition
# ---------------------------------------------------------------------------


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A pure period-4 cycle on a flat level: trend ~= level, seasonal
    recovers the cycle shape (mean-centered), remainder ~= 0 away from
    the edges; the additive identity holds exactly in q-units."""
    from payroll_etl_fastapi_spark.operators.timeseries import seasonal_decompose

    cycle = [10, 2, 6, 2]  # mean 5
    rows = [("a", t, 100 + cycle[t % 4]) for t in range(24)]
    df = spark.createDataFrame(rows, "key string, t long, y long")
    out = {r.t: r for r in seasonal_decompose(df, period=4).collect()}
    p2 = 8  # 2 * period
    # edges: first/last half-period rows have NULL trend and remainder
    assert out[0].trend_q is None and out[23].remainder_q is None
    mid = out[10]
    assert mid.trend_q is not None
    # additive identity: 2p*y = trend + seasonal + remainder
    for t in range(2, 22):
        r = out[t]
        assert p2 * r.y == r.trend_q + r.seasonal_q + r.remainder_q, t
    # trend over a constant-level cycle is the level itself (105 * 2p)
    assert mid.trend_q == 105 * p2
    # seasonal is the mean-centered cycle in q-units
    got_cycle = sorted({(t % 4, out[t].seasonal_q) for t in range(2, 22)})
    assert got_cycle == [(0, 5 * p2), (1, -3 * p2), (2, 1 * p2), (3, -3 * p2)]
    # remainder vanishes on the pure signal
    assert all(out[t].remainder_q == 0 for t in range(2, 22))


def test_seasonal_decompose_validation_and_spike(spark):
    import pytest
    from payroll_etl_fastapi_spark.operators.timeseries import seasonal_decompose

    df = spark.createDataFrame([("a", 0, 1)], "key string, t long, y long")
    with pytest.raises(ValueError, match="even"):
        seasonal_decompose(df, period=5)
    with pytest.raises(ValueError, match="even"):
        seasonal_decompose(df, period=1)
    # a one-off spike lands in the remainder, not the seasonal table
    cycle = [4, 0]
    rows = [("a", t, 50 + cycle[t % 2] + (40 if t == 9 else 0)) for t in range(20)]
    out = {
        r.t: r
        for r in seasonal_decompose(
            spark.createDataFrame(rows, "key string, t long, y long"), period=2
        ).collect()
    }
    spikes = [t for t in range(1, 19) if abs(out[t].remainder_q) >= 40]
    assert 9 in spikes
