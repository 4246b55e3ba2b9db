"""Multi-level aggregation queries for the driver gate: ROLLUP, CUBE and
GROUPING SETS — the OLAP shapes a reporting layer on the star schema needs
(the reference serves fixed per-dept rollups; these generalize that to
subtotal lattices).

Determinism: grouping-null keys are disambiguated with grouping_id() AND
coalesced to a sentinel label ('ALL'), so null-ordering differences between
engines cannot reorder rows; measures are integer-cents sums / counts.

Scale: Spark executes rollup/cube as a single Expand + one hash aggregate —
one shuffle total regardless of how many grouping levels are produced, the
same cost as the finest-grained groupBy alone."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.plans.suite import _msum, _sql_msum, _t, query

_ALL = "ALL"


@query(
    "rollup_returnflag_status",
    oracle=f"""
    SELECT GROUPING_ID(l_returnflag, l_linestatus)      AS gid,
           coalesce(l_returnflag, '{_ALL}')             AS returnflag,
           coalesce(l_linestatus, '{_ALL}')             AS linestatus,
           count(*)                                     AS line_count,
           {_sql_msum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, returnflag, linestatus
    """,
)
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (flag, status): per-pair, per-flag subtotal, grand total in one
    pass — Spark plans Expand + ONE hash aggregate (one shuffle for all
    three levels)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("line_count"),
            _msum(rev).alias("revenue"),
        )
        .select(
            "gid",
            F.coalesce(F.col("l_returnflag"), F.lit(_ALL)).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit(_ALL)).alias("linestatus"),
            "line_count",
            "revenue",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


@query(
    "cube_priority_status",
    oracle=f"""
    SELECT GROUPING_ID(o_orderpriority, o_orderstatus)  AS gid,
           coalesce(o_orderpriority, '{_ALL}')          AS priority,
           coalesce(o_orderstatus, '{_ALL}')            AS status,
           count(*)                                     AS order_count,
           {_sql_msum('o_totalprice')}                  AS total
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY gid, priority, status
    """,
)
def cube_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (priority, status): all four grouping levels in one Expand +
    single aggregate."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("order_count"),
            _msum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            "gid",
            F.coalesce(F.col("o_orderpriority"), F.lit(_ALL)).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit(_ALL)).alias("status"),
            "order_count",
            "total",
        )
        .orderBy("gid", "priority", "status")
    )


@query(
    "grouping_sets_nation_segment",
    oracle=f"""
    SELECT GROUPING_ID(n_name, c_mktsegment)  AS gid,
           coalesce(n_name, '{_ALL}')         AS nation,
           coalesce(c_mktsegment, '{_ALL}')   AS segment,
           count(*)                           AS customers,
           {_sql_msum('c_acctbal')}           AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
    ORDER BY gid, nation, segment
    """,
)
def grouping_sets_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((nation), (segment)): two independent rollups in one
    scan. The DataFrame API has no grouping-sets verb, so this goes through
    spark.sql — same Expand + single-aggregate physical plan as rollup/cube."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    joined.createOrReplaceTempView("_gs_cust_nation")
    cents = "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"
    return spark.sql(
        f"""
        SELECT grouping_id(n_name, c_mktsegment)  AS gid,
               coalesce(n_name, '{_ALL}')         AS nation,
               coalesce(c_mktsegment, '{_ALL}')   AS segment,
               count(*)                           AS customers,
               -- CAST: Spark SQL parses a bare 100.0 literal as DECIMAL(3,1)
               -- (the DataFrame / 100.0 is a Python float → double)
               sum({cents}) / CAST(100.0 AS DOUBLE) AS total_bal
        FROM _gs_cust_nation
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        ORDER BY gid, nation, segment
        """
    )


def _q1_sql(div: str) -> str:
    c = lambda e: f"CAST(floor(({e}) * 100 + 0.5) AS BIGINT)"
    return f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({c('l_quantity')}) AS BIGINT)        AS sum_qty_cents,
           CAST(sum({c('l_extendedprice')}) AS BIGINT)   AS sum_base_cents,
           CAST(sum({c('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
                                                         AS sum_disc_cents,
           CAST(sum({c('l_extendedprice * (1 - l_discount) * (1 + l_tax)')})
                AS BIGINT)                               AS sum_charge_cents,
           CAST(count(*) AS BIGINT)                      AS count_order,
           CAST(sum({c('l_quantity')}) {div} count(*) AS BIGINT)
                                                         AS avg_qty_cents
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """


@query("sql_pricing_summary", oracle=_q1_sql("//"))
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) through the PURE SQL entry path: the
    query text goes to ``spark.sql`` over a registered view — same
    Catalyst plan the DataFrame API produces (one scan with the pushed
    shipdate filter, one map-side-combined hash aggregate, presentation
    sort), demonstrating that the engine's second API surface carries the
    full determinism conventions: integer-cents sums and an integer DIV
    average, so the oracle is literally the same text modulo the division
    spelling. NEW in round 4 (post-tail); round-5 rotation candidate."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_q1_sql("DIV"))
