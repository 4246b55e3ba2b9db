"""Skew-rewrite gate query: the salted two-stage aggregation
(operators/skew.salted_sum) must be EXACTLY equal to the plain GROUP BY it
rewrites — integer-cents sums are order-free, so the DuckDB oracle is just
the unsalted query. A wrong salt combine (double count, lost bucket, salt
leaking into keys) flips the hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.skew import salted_sum
from payroll_etl_fastapi_spark.plans.suite import _cents, _sql_cents, _t, query


@query(
    "skew_salted_rollup",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum({_sql_cents('value')}) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def skew_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event rollup through the SALTED plan: (user_id, salt)
    partial sums — at most salt_buckets tasks share one hot key — then a
    tiny final combine. Results are bit-equal to the one-stage groupBy
    because every aggregate is a decomposable integer sum.

    Scale shape: the salting price is a second aggregation over
    salt_buckets × |keys| rows; the payoff is that a key holding 1% of a
    100 TB fact stops funneling 1 TB through one reducer."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        _cents(F.col("value")).alias("cents"),
        F.lit(1).cast("long").alias("one"),
    )
    out = salted_sum(ev, ["user_id"], {"one": "n_events", "cents": "sum_cents"})
    return out.select("user_id", "n_events", "sum_cents").orderBy("user_id")
