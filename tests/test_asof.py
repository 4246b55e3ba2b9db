"""Unit tests for operators/asof.py: as-of join semantics (direction, ties,
tolerance, unmatched-left nulls) and the bucketed range join against a
brute-force inequality join."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import asof


def _ts(minute: int, us: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0, us)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10), "p1"),
            (2, 1, _ts(20), "p2"),
            (3, 1, _ts(5), "p3"),   # before any right row
            (4, 2, _ts(30), "p4"),  # key with a single right row at equal ts
            (5, 3, _ts(30), "p5"),  # key absent on the right entirely
        ],
        "event_id long, user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 80.0),
            (1, _ts(15), 150.0),
            (1, _ts(25), 250.0),   # after left max for user 1 backward tests
            (2, _ts(30), 300.0),   # equal-ts tie with left event 4
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_semantics(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof.asof_join(left, right, on=["user_id"]).collect()
    }
    assert got[1] == (_ts(8), 80.0)      # most recent prior, not just any
    assert got[2] == (_ts(15), 150.0)
    assert got[3] == (None, None)        # nothing at or before → null match
    assert got[4] == (_ts(30), 300.0)    # equal ts counts (<=)
    assert got[5] == (None, None)        # key missing on right entirely


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof.asof_join(left, right, on=["user_id"], direction="forward").collect()
    }
    assert fwd[3] == (_ts(8), 80.0)      # next at-or-after
    assert fwd[2] == (_ts(25), 250.0)
    assert fwd[4] == (_ts(30), 300.0)    # equal ts counts (>=)

    tol = {
        r.event_id: r.asof_value
        for r in asof.asof_join(
            left, right, on=["user_id"], tolerance_us=2 * 60 * 1_000_000
        ).collect()
    }
    assert tol[1] == 80.0                # 2-minute gap: inside tolerance
    assert tol[2] is None                # 5-minute gap: nulled out


def test_asof_keeps_left_payload_columns(spark):
    left, right = _frames(spark)
    row = (
        asof.asof_join(left, right, on=["user_id"])
        .filter(F.col("event_id") == 1)
        .first()
    )
    assert row.tag == "p1" and row.user_id == 1 and row.ts == _ts(10)


def test_range_join_matches_brute_force(spark):
    # randomized-ish grid: 3 users x 40 left + 60 right rows with microsecond
    # offsets that land on and off bucket boundaries
    left = spark.createDataFrame(
        [
            (100 * u + i, u, _ts(i % 50, (i * 137) % 1_000_000))
            for u in (1, 2, 3)
            for i in range(40)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (u, _ts(j % 55, (j * 311) % 1_000_000), float(j))
            for u in (1, 2, 4)
            for j in range(60)
        ],
        "user_id long, ts timestamp, value double",
    )
    lower, upper = -3 * 60 * 1_000_000, 60 * 1_000_000  # [-3 min, +1 min]
    got = {
        (r.event_id, r.r_ts, r.r_value)
        for r in asof.range_join_bucketed(
            left, right, on=["user_id"], lower_us=lower, upper_us=upper
        ).collect()
    }
    l_us = F.unix_micros(left.ts)
    r_us = F.unix_micros(right.ts)
    brute = {
        (r.event_id, r.rts, r.value)
        for r in left.join(right, "user_id")
        .filter((r_us >= l_us + lower) & (r_us <= l_us + upper))
        .select("event_id", right.ts.alias("rts"), "value")
        .collect()
    }
    assert got == brute
    assert brute  # non-vacuous


def test_asof_join_rejects_reserved_column_collisions(spark):
    from payroll_etl_fastapi_spark.operators import asof

    left = spark.createDataFrame(
        [(1, _ts(0, 0), 1.0)], "user_id long, ts timestamp, _ts double"
    )
    right = spark.createDataFrame(
        [(1, _ts(0, 0), 1.0)], "user_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="_ts"):
        asof.asof_join(left, right, on=["user_id"])
    # an output-name collision (asof_value already on the left) must also fail
    left2 = spark.createDataFrame(
        [(1, _ts(0, 0), 1.0)], "user_id long, ts timestamp, asof_value double"
    )
    with pytest.raises(ValueError, match="asof_value"):
        asof.asof_join(left2, right, on=["user_id"])


def test_range_join_rejects_reserved_column_collisions(spark):
    from payroll_etl_fastapi_spark.operators import asof

    left = spark.createDataFrame(
        [(1, _ts(0, 0), 2)], "user_id long, ts timestamp, _bucket long"
    )
    right = spark.createDataFrame(
        [(1, _ts(0, 0), 1.0)], "user_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="_bucket"):
        asof.range_join_bucketed(left, right, on=["user_id"], upper_us=1)
