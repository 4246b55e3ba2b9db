"""Quantile-binning gate query: deciles of customer balance (integer cents),
per-bin populations and sums, against a DuckDB oracle that recomputes the
same edges with quantile_cont and the same strict-greater bucket rule.

This gate doubles as the cross-engine proof for the exact-percentile
interpolation parity that operators/binning.py relies on (Spark
``percentile`` ≡ DuckDB ``quantile_cont`` on integer inputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.binning import quantile_bins
from payroll_etl_fastapi_spark.plans.suite import _sql_cents, _t, query

_PS = [i / 10 for i in range(1, 10)]


@query(
    "feature_quantile_bins",
    oracle=f"""
    WITH c AS (
        SELECT {_sql_cents('c_acctbal')} AS cents FROM customer
    ),
    edges AS (SELECT quantile_cont(cents, {_PS}) AS qs FROM c),
    binned AS (
        SELECT cents,
               len(list_filter((SELECT qs FROM edges), e -> cents > e)) AS bin
        FROM c
    )
    SELECT bin,
           count(*)                       AS n,
           CAST(min(cents) AS BIGINT)     AS lo_cents,
           CAST(max(cents) AS BIGINT)     AS hi_cents,
           CAST(sum(cents) AS BIGINT)     AS sum_cents
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def feature_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-bin customer balances and aggregate per bin. Equal-population
    by construction (up to ties at the edges, which go to the lower bin in
    both engines).

    Scale shape: one tiny edge aggregate (9 doubles to the driver), then a
    shuffle-free per-row array filter, then one 10-key grouped aggregate.
    These edges ARE balanced range-partition split points — the same
    operator balances a skewed repartitionByRange. The 100 TB default is
    exact=False (mergeable GK sketch) — see operators/binning.py."""
    cust = _t(spark, sf_dir, "customer").select(
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    binned = quantile_bins(cust, F.col("cents"), 10)
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bin")
    )


from payroll_etl_fastapi_spark.operators.zorder import zvalue, zvalue_sql  # noqa: E402

_ZBITS = 10
_SQL_X = "(o_orderkey % 1024)"
_SQL_Y = f"({_sql_cents('o_totalprice')} % 1024)"


@query(
    "zorder_values",
    oracle=f"""
    SELECT o_orderkey                       AS orderkey,
           {_SQL_X}                         AS x,
           {_SQL_Y}                         AS y,
           {zvalue_sql([_SQL_X, _SQL_Y], _ZBITS)} AS z
    FROM orders
    WHERE o_orderkey % 37 = 0
    ORDER BY orderkey
    """,
)
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over two order dimensions — the clustering key behind
    operators/zorder.zorder_write, pinned cross-engine: Spark's
    shiftleft/bitwiseOR unroll and the oracle's SQL bit-ops must interleave
    identically bit for bit.

    Scale shape: the z-value is a pure projection (20 codegen'd terms inside
    one WholeStageCodegen stage, no shuffle); the write path adds one range
    exchange on z — see the layout test for the pruning payoff."""
    o = _t(spark, sf_dir, "orders")
    x = (F.col("o_orderkey") % 1024).cast("long")
    y = (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long") % 1024)
    return (
        o.filter(F.col("o_orderkey") % 37 == 0)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            x.alias("x"),
            y.alias("y"),
            zvalue([x, y], _ZBITS).alias("z"),
        )
        .orderBy("orderkey")
    )
