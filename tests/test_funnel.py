"""Funnel analysis (operators/funnel.py): strict-ordering semantics,
stall-out accounting, lag arithmetic, and plan shape."""

from __future__ import annotations

import datetime as dt

from payroll_etl_fastapi_spark.operators import funnel as FN


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes in order: view@1 click@2 purchase@3
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # u2 clicks BEFORE viewing -> stalls at view
        (2, "click", 1), (2, "view", 2),
        # u3 views then purchases without click -> stalls at click... but a
        # later click@5 then purchase@6 completes the chain
        (3, "view", 1), (3, "purchase", 2), (3, "click", 5), (3, "purchase", 6),
        # u4 never views -> not even step 1
        (4, "click", 1), (4, "purchase", 2),
    ]
    out = {r.step_idx: r for r in FN.funnel_counts(
        _ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out[1].n_users == 3          # u1, u2, u3
    assert out[2].n_users == 2          # u1 (click@2), u3 (click@5)
    assert out[3].n_users == 2          # u1 (purchase@3), u3 (purchase@6)
    assert out[1].conv_bp == 10000
    assert out[2].conv_bp == 6666
    # lags: u1 purchase-view = 2s, u3 = 5s -> avg = 3500ms
    assert out[3].avg_lag_ms == 3500


def test_funnel_first_qualifying_chain_uses_earliest_times(spark):
    rows = [
        # first view at 1; clicks at 0 (ignored: before view) and 4;
        # purchases at 3 (ignored: before click@4) and 9
        (1, "click", 0), (1, "view", 1), (1, "purchase", 3),
        (1, "click", 4), (1, "purchase", 9), (1, "view", 7),
    ]
    ft = FN.funnel_times(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    assert len(ft) == 1
    r = ft[0]
    assert (r.t1.second, r.t2.second, r.t3.second) == (1, 4, 9)


def test_funnel_plan_no_cartesian_and_pushed_filters(spark):
    ev = _ev(spark, [(1, "view", 1), (1, "click", 2)])
    plan = (
        FN.funnel_counts(ev, ["view", "click"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # the ONLY nested-loop join allowed is the 1-row broadcast cross join
    # attaching the step-1 denominator; the per-step joins must all be
    # equality joins on the user key
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_transition_matrix_counts_and_row_normalization(spark):
    import datetime as dt

    rows = [
        (1, 100, "a", 1), (1, 101, "b", 2), (1, 102, "a", 3), (1, 103, "b", 4),
        (2, 200, "a", 1), (2, 201, "a", 2),
    ]
    df = spark.createDataFrame(
        [(u, e, t, dt.datetime(2024, 1, 1, 0, 0, s)) for u, e, t, s in rows],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    from payroll_etl_fastapi_spark.operators.funnel import transition_matrix

    out = {(r.from_type, r.to_type): r for r in transition_matrix(df).collect()}
    # u1: a->b, b->a, a->b ; u2: a->a  (no cross-user pair)
    assert out[("a", "b")].n == 2 and out[("a", "a")].n == 1
    assert out[("b", "a")].n == 1
    assert out[("a", "b")].row_bp == 6666 and out[("a", "a")].row_bp == 3333
    assert out[("b", "a")].row_bp == 10000
    assert len(out) == 3


def test_transition_matrix_tiebreak_is_total(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 2, "x", t0), (1, 1, "y", t0)],  # equal ts: event_id orders y -> x
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    from payroll_etl_fastapi_spark.operators.funnel import transition_matrix

    out = [(r.from_type, r.to_type) for r in transition_matrix(df).collect()]
    assert out == [("y", "x")]


def test_journey_ngrams_order_sensitive_and_complete(spark):
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators.funnel import journey_ngrams

    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "b"),
            (2, 5, "a"), (2, 6, "b"), (2, 7, "c"),
            (3, 8, "c"), (3, 9, "b"), (3, 10, "a"),
        ],
        "user_id long, event_id long, event_type string",
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
    rows = {r.ngram: r for r in journey_ngrams(df, n=3, top_k=10).collect()}
    # a>b>c appears in user 1 and user 2; reversed c>b>a only in user 3
    assert rows["a>b>c"].n_occurrences == 2 and rows["a>b>c"].n_users == 2
    assert rows["c>b>a"].n_occurrences == 1
    # user 1 also contributes the shifted window b>c>b
    assert rows["b>c>b"].n_occurrences == 1
    # windows never cross users: only 3 + 1 + 1 + 1 = no b>c>a etc.
    assert "c>a>b" not in rows and "b>a>b" not in rows
