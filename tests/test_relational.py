"""Plan-shape and semantics tests for the relational-breadth suite
(plans/suite_relational.py). Value correctness is gated by
tools/check_oracle.py / the driver; these tests pin the physical shapes that
make the queries scale and the semantics that a refactor could silently break."""

from __future__ import annotations

import io
import re

from contextlib import redirect_stdout

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.plans.suite import QUERIES
import payroll_etl_fastapi_spark.plans.suite_relational  # noqa: F401  (registers)

from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str, label: str) -> int:
    return len(re.findall(rf"^\(\d+\) {label}", plan, flags=re.M))


def test_q3_broadcasts_customer_and_takes_ordered(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-10, never a global sort
    assert _nodes(plan, "BroadcastHashJoin") >= 1  # filtered customer side
    # both date predicates reach the scans
    assert re.search(r"PushedFilters:.*LessThan\(o_orderdate", plan)
    assert re.search(r"PushedFilters:.*GreaterThan\(l_shipdate", plan)


def test_q5_broadcasts_dims_no_cartesian(spark):
    plan = _plan(spark, "tpch_q5_local_supplier_volume")
    assert _nodes(plan, "BroadcastHashJoin") >= 2  # supplier + region-filtered nation
    assert "CartesianProduct" not in plan
    assert re.search(r"PushedFilters:.*o_orderdate", plan)


def test_semi_and_anti_join_operators(spark):
    semi = _plan(spark, "join_semi_urgent_customers")
    anti = _plan(spark, "join_anti_no_urgent_customers")
    assert "LeftSemi" in semi and "Aggregate" not in semi  # no distinct added
    assert "LeftAnti" in anti
    # the orders side is pruned to the join column + the filter column only
    assert re.search(r"ReadSchema:.*struct<o_custkey:bigint,o_orderpriority:string>", semi)
    assert re.search(r"ReadSchema:.*struct<o_custkey:bigint,o_orderpriority:string>", anti)


def test_windows_share_one_exchange_and_sort(spark):
    plan = _plan(spark, "window_customer_running_totals")
    # all 5 window functions share one partition spec: exactly one exchange
    # on o_custkey and one sort below the final output ordering
    assert len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)) <= 2  # window + final sort
    assert _nodes(plan, "Window") <= 2  # running-frame + default-frame, not 5


def test_semi_anti_partition_counts_add_up(spark):
    semi = QUERIES["join_semi_urgent_customers"](spark, SF_ORACLE)
    anti = QUERIES["join_anti_no_urgent_customers"](spark, SF_ORACLE)
    total = (
        QUERIES["join_semi_urgent_customers"](spark, SF_ORACLE)
        .sparkSession.read.parquet(f"{SF_ORACLE}/customer.parquet")
        .count()
    )
    assert semi.count() + anti.count() == total


def test_scalar_subquery_membership_is_exact(spark):
    df = QUERIES["scalar_subquery_above_brand_avg"](spark, SF_ORACLE)
    rows = df.collect()
    assert rows, "some parts must be above their brand average"
    # integer cross-multiplication: every emitted row satisfies it exactly
    assert all(r.price_cents * r.brand_cnt > r.brand_sum_cents for r in rows)


def test_set_ops_are_distinct_and_disjoint(spark):
    df = QUERIES["set_ops_nation_coverage"](spark, SF_ORACLE)
    rows = df.collect()
    both = {r.nationkey for r in rows if r.tag == "both"}
    only = {r.nationkey for r in rows if r.tag == "customer_only"}
    assert both and only
    assert not (both & only)
    assert len(rows) == len(both) + len(only)  # no multiset leakage


def test_edit_distance_blocked_join_not_cartesian(spark):
    plan = _plan(spark, "similarity_edit_distance")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "p_brand" in plan
    df = QUERIES["similarity_edit_distance"](spark, SF_ORACLE)
    bad = df.filter((F.col("edit_dist") > 3) | (F.col("partkey_a") >= F.col("partkey_b")))
    assert bad.count() == 0


def test_topk_per_group_single_window_exchange(spark):
    plan = _plan(spark, "topk_per_group_orders")
    assert _nodes(plan, "Window$") == 1
    # rank<=k is pushed below the exchange as WindowGroupLimit (partial +
    # final): each map task keeps only its local top-2 per key, so the
    # shuffle moves O(k·groups) rows, not the whole orders table
    assert _nodes(plan, "WindowGroupLimit") >= 1
    df = QUERIES["topk_per_group_orders"](spark, SF_ORACLE)
    rows = df.collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.custkey, []).append(r.rnk)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_key.values())


def test_pivot_is_single_aggregate_pass(spark):
    plan = _plan(spark, "pivot_segment_balances")
    # declared pivot values: the plan is the two-level pivot aggregate
    # ((nation,segment) partial → pivot to columns) + the output sort — and
    # crucially NO distinct-scan of c_mktsegment to discover the columns
    # (that extra blocking job appears only when pivot values are omitted)
    assert _nodes(plan, "Exchange") <= 3
    assert _nodes(plan, "Scan parquet") == 1
    df = QUERIES["pivot_segment_balances"](spark, SF_ORACLE)
    row = df.filter(F.col("nationkey") == 0).first()
    assert row is not None and len(df.columns) == 6


def test_rolling_distinct_exact_window_semantics(spark):
    """Hand-checkable trailing-7-day distinct: user A active on days 1 and 9
    (outside each other's windows), user B on day 5 only."""
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators.timeseries import rolling_distinct

    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1),
            ("2024-01-01 11:00:00", 1),   # same day, same user — no double count
            ("2024-01-09 10:00:00", 1),
            ("2024-01-05 10:00:00", 2),
        ],
        "ts string, user_id long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    rows = {
        str(r.day): r for r in rolling_distinct(df, "user_id", "ts", 7).collect()
    }
    # only days with events report (inner-join convention)
    assert set(rows) == {"2024-01-01", "2024-01-05", "2024-01-09"}
    assert (rows["2024-01-01"].dau, rows["2024-01-01"].wau) == (1, 1)
    # day 5 window [jan-1 .. jan-5 + trailing]: covers A(day1) + B(day5)
    assert (rows["2024-01-05"].dau, rows["2024-01-05"].wau) == (1, 2)
    # day 9 window [jan-3 .. jan-9]: A(day9) + B(day5); A's day-1 visit aged out
    assert (rows["2024-01-09"].dau, rows["2024-01-09"].wau) == (1, 2)
    assert rows["2024-01-09"].stickiness_bp == 5000


def test_range_frame_totals_matches_bruteforce(spark):
    """The RANGE-frame trailing sum must equal the brute-force inequality
    self-join definition (sum over same-user events in (t-1h, t])."""
    import datetime as dt

    import payroll_etl_fastapi_spark.plans.suite_windows  # noqa: F401
    from payroll_etl_fastapi_spark.plans.suite import QUERIES

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in ("a", "b"):
        for m in (0, 10, 59, 60, 61, 150, 3000):
            eid += 1
            rows.append((eid, u, base + dt.timedelta(minutes=m), 1.0 + eid))
    ev = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp, value double")
    ev.createOrReplaceTempView("t_range_ev")
    got = spark.sql("""
        SELECT event_id,
               count(*) OVER w AS n_trailing,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS cents_trailing
        FROM t_range_ev
        WINDOW w AS (PARTITION BY user_id ORDER BY unix_micros(ts)
                     RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
    """).collect()
    brute = {
        r.event_id: (r.n, r.c)
        for r in spark.sql("""
            SELECT a.event_id, count(*) AS n,
                   sum(CAST(floor(b.value * 100 + 0.5) AS BIGINT)) AS c
            FROM t_range_ev a JOIN t_range_ev b
              ON a.user_id = b.user_id
             AND unix_micros(b.ts) > unix_micros(a.ts) - 3600000000
             AND unix_micros(b.ts) <= unix_micros(a.ts)
            GROUP BY a.event_id
        """).collect()
    }
    for r in got:
        assert (r.n_trailing, r.cents_trailing) == brute[r.event_id], r.event_id
    # the gate itself runs and returns the top-20 shape
    out = QUERIES["events_range_frame_totals"](spark, "/root/testdata/sf0.001")
    rows20 = out.collect()
    assert 0 < len(rows20) <= 20
    assert rows20 == sorted(rows20, key=lambda r: (-r.cents_trailing, r.event_id))
