"""Bucketed-join gate query: write both join sides bucketed on the join
key, run the zero-Exchange co-located join (plan shape asserted in
tests/test_bucketing.py), and checksum the rollup against the plain-SQL
oracle — so the bucketing write path, catalog round-trip, and join
execute for real every round."""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from payroll_etl_fastapi_spark.plans.suite import _cents, _sql_cents, _t, query
from payroll_etl_fastapi_spark.sources.bucketing import read_table, write_bucketed

_counter = itertools.count()
_BUCKETS = 8


@query(
    "bucketed_join_rollup",
    oracle=f"""
    WITH li AS (
        SELECT l_orderkey,
               count(*) AS n_lines,
               CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) AS line_cents
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_orders,
           CAST(sum(li.n_lines) AS BIGINT)    AS n_lines,
           CAST(sum(li.line_cents) AS BIGINT) AS line_cents
    FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders ⋈ per-order lineitem rollup through BUCKETED catalog tables:
    both sides written bucketBy(8, orderkey), so the sort-merge join aligns
    bucket files with NO Exchange on either side (the organization the
    reference pre-pays with its PK B-trees). Results computed eagerly, the
    scratch tables dropped, the rollup returned as a local frame — repeated
    runs leave nothing behind in the session warehouse.

    Scale shape: bucketing converts every future join/groupBy on the key
    into shuffle-free plans for one up-front bucketed write — the 100 TB
    trade this gate exercises end to end."""
    import uuid

    # uuid suffix, not a process-local counter: a counter restarts at 0 in
    # every fresh process, so a killed run's higher-numbered scratch tables
    # would never be reclaimed, and two processes sharing a warehouse would
    # overwrite each other's table 0
    n = f"{next(_counter)}_{uuid.uuid4().hex[:8]}"
    t_orders, t_li = f"gate_bkt_orders_{n}", f"gate_bkt_li_{n}"
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("line_cents"),
        )
    )
    # the gate data is tiny, so without this the join would BROADCAST and
    # the bucketed sort-merge path — the thing under test — would be dead
    # code in the gate
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, t_orders, ["o_orderkey"], _BUCKETS)
        write_bucketed(li, t_li, ["l_orderkey"], _BUCKETS)
        joined = read_table(spark, t_orders).join(
            read_table(spark, t_li),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        rows = (
            joined.groupBy(F.col("o_orderpriority").alias("priority"))
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("n_lines").alias("n_lines"),
                F.sum("line_cents").alias("line_cents"),
            )
            .orderBy("priority")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in (t_orders, t_li):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    schema = T.StructType(
        [
            T.StructField("priority", T.StringType()),
            T.StructField("n_orders", T.LongType()),
            T.StructField("n_lines", T.LongType()),
            T.StructField("line_cents", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r["priority"], r["n_orders"], r["n_lines"], r["line_cents"]) for r in rows],
        schema,
    )
