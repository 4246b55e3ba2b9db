"""Time-series join queries for the driver gate: as-of join and banded range
join over the events table (operators/asof.py), each paired with a DuckDB
oracle — the as-of oracle uses DuckDB's NATIVE ASOF JOIN, so the union+window
Spark plan is checked against an independent engine-level implementation of
the same semantics, not a replay of our own algorithm.

Determinism: (user_id, ts) is unique within each event_type slice of the
testdata (verified), which is the same uniqueness contract DuckDB's ASOF
assumes; matched values are raw column passthroughs; timestamps are emitted
as formatted strings; money sums are integer-cents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import asof
from payroll_etl_fastapi_spark.plans.suite import _msum, _sql_msum, _t, query

_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_SQL_FMT = "%Y-%m-%d %H:%M:%S.%f"

RANGE_US = 6 * 60 * 60 * 1_000_000  # 6 hours (events per user are hours apart)


@query(
    "events_asof_join",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '{_SQL_FMT}') AS ts,
           strftime(v.ts, '{_SQL_FMT}') AS view_ts,
           v.value                      AS view_value
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.asof.asof_join): every purchase gets the most
    recent prior-or-equal view by the same user, LEFT-outer. The Spark plan
    is ONE shuffle on user_id (union + window), checked here against DuckDB's
    independent native ASOF JOIN implementation."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof.asof_join(p, v, on=["user_id"], ts="ts", values=("value",))
    return out.select(
        "event_id",
        "user_id",
        F.date_format(F.col("ts"), _FMT).alias("ts"),
        F.date_format(F.col("asof_ts"), _FMT).alias("view_ts"),
        F.col("asof_value").alias("view_value"),
    ).orderBy("event_id")


@query(
    "events_range_join",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id,
           count(*)              AS n_views,
           {_sql_msum('v.value')} AS views_value
    FROM p JOIN v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 6 HOUR
     AND v.ts <= p.ts
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (operators.asof.range_join_bucketed): views within
    the 6 hours before each purchase, rolled up per purchase. The naive
    inequality join is a per-key nested loop; the bucketed plan is a pure
    equality join on (user_id, time-bucket) with a 2-bucket probe — the
    oracle runs the naive form and must agree exactly."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    joined = asof.range_join_bucketed(
        p, v, on=["user_id"], ts="ts", lower_us=-RANGE_US, upper_us=0, prefix="v_"
    )
    return (
        joined.groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            _msum(F.col("v_value")).alias("views_value"),
        )
        .orderBy("event_id")
    )
