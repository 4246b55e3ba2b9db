"""Association rules (operators/assoc.py) and cohort retention
(operators/funnel.cohort_retention): metric arithmetic vs Python replicas
and boundary semantics."""

from __future__ import annotations

import datetime as dt

from payroll_etl_fastapi_spark.operators import assoc as A
from payroll_etl_fastapi_spark.operators import funnel as FN


def test_assoc_rules_metrics_exact(spark):
    # baskets: {1,2} x3, {1,3} x1, {2,3} x1, {1} x1  -> N=6 baskets
    rows = []
    bid = 0
    for _ in range(3):
        rows += [(bid, 1), (bid, 2)]; bid += 1
    rows += [(bid, 1), (bid, 3)]; bid += 1
    rows += [(bid, 2), (bid, 3)]; bid += 1
    rows += [(bid, 1)]; bid += 1
    df = spark.createDataFrame(rows, "basket long, item long")
    out = {
        (r.antecedent, r.consequent): r
        for r in A.pair_association_rules(df, "basket", "item",
                                          min_pair_count=2, top_k=10).collect()
    }
    # only pair {1,2} has c_ab >= 2; both directions emitted
    assert set(out) == {(1, 2), (2, 1)}
    r = out[(1, 2)]
    # c_1 = 5 baskets, c_2 = 4, c_12 = 3, N = 6
    assert (r.c_ab, r.c_a, r.c_b) == (3, 5, 4)
    assert r.support_bp == 3 * 10000 // 6
    assert r.confidence_bp == 3 * 10000 // 5
    assert r.lift_micro == 3 * 6 * 1000000 // (5 * 4)
    rev = out[(2, 1)]
    assert rev.confidence_bp == 3 * 10000 // 4
    assert rev.lift_micro == r.lift_micro  # lift is symmetric


def test_assoc_duplicate_lines_one_basket_count(spark):
    # the same item twice in one basket counts once (DISTINCT basket-item)
    df = spark.createDataFrame(
        [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)], "basket long, item long"
    )
    out = A.pair_association_rules(df, "basket", "item", 2, 10).collect()
    by = {(r.antecedent, r.consequent): r for r in out}
    assert by[(7, 8)].c_ab == 2 and by[(7, 8)].c_a == 2


def test_cohort_retention_triangle(spark):
    def ts(day, hour=12):
        return dt.datetime(2024, 1, day, hour)

    # 2024-01-01 is a Monday. u1,u2 first seen week 0; u1 returns weeks 1,2;
    # u2 never returns. u3 first seen week 1, returns week 2 (offset 1).
    rows = [
        (1, ts(1)), (1, ts(9)), (1, ts(16)),
        (2, ts(2)),
        (3, ts(8)), (3, ts(15)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week, r.offset_week): (r.n_users, r.retention_bp)
        for r in FN.cohort_retention(df).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 10000)
    assert out[("2024-01-01", 1)] == (1, 5000)
    assert out[("2024-01-01", 2)] == (1, 5000)
    assert out[("2024-01-08", 0)] == (1, 10000)
    assert out[("2024-01-08", 1)] == (1, 10000)


def test_cohort_same_week_second_visit_is_offset_zero(spark):
    rows = [
        (1, dt.datetime(2024, 1, 2, 9)),   # Tuesday
        (1, dt.datetime(2024, 1, 7, 9)),   # Sunday, same ISO week, 5 days later
        (1, dt.datetime(2024, 1, 10, 9)),  # next week but 8 days -> offset 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week, r.offset_week) for r in FN.cohort_retention(df).collect()}
    # offsets are DAY-based sevenths from the user's first event, not
    # calendar-week boundaries: day 5 -> offset 0, day 8 -> offset 1
    assert out == {("2024-01-01", 0), ("2024-01-01", 1)}
