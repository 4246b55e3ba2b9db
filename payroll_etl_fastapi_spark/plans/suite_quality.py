"""Data-quality gate query: the declarative constraint audit
(operators/quality.py) over the orders/lineitem/customer tables, one row per
rule, DuckDB-replayed. The positive path is real: the synthetic lineitem
violates its nominal (orderkey, linenumber) key (discovered building the
txtable gate), so the uniqueness audit reports genuine excess rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import quality as Q
from payroll_etl_fastapi_spark.plans.suite import _t, query

_PRICE_LO, _PRICE_HI = 0.0, 150000.0


@query(
    "quality_constraint_audit",
    oracle=f"""
    SELECT 'not_null_o_custkey' AS rule,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'range_o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                          AND (o_totalprice < {_PRICE_LO} OR o_totalprice > {_PRICE_HI})
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'matches_o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND NOT regexp_matches(o_orderstatus, '^[OFP]$')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique_lineitem_pk',
           (SELECT count(*) FROM lineitem),
           CAST((SELECT count(*) FROM lineitem)
                - (SELECT count(*) FROM (
                       SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
                AS BIGINT)
    UNION ALL
    SELECT 'fk_orders_customer',
           (SELECT count(*) FROM orders),
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    ORDER BY rule
    """,
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five constraints, three operator shapes, one uniform
    (rule, n_rows, n_violations) report:

    - three row-local rules (not-null, range, regex) — ONE conditional
      aggregate pass over orders, N rules per scan;
    - candidate-key uniqueness on lineitem — one shuffle on the key;
    - orders→customer foreign key — left-anti join against the parent keys.

    Scale shape: no rule costs more than the cheapest plan that could
    possibly check it; adding row-local rules is free (same scan)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    row_local = Q.check(
        orders,
        [
            Q.not_null("o_custkey"),
            Q.in_range("o_totalprice", _PRICE_LO, _PRICE_HI),
            Q.matches("o_orderstatus", "^[OFP]$"),
        ],
    )
    uniq = Q.unique(lineitem, ["l_orderkey", "l_linenumber"]).select(
        F.lit("unique_lineitem_pk").alias("rule"),
        (F.col("n_keys") + F.col("n_excess_rows")).alias("n_rows"),
        F.col("n_excess_rows").alias("n_violations"),
    )
    fk = Q.foreign_key(orders, ["o_custkey"], customer, ["c_custkey"]).select(
        F.lit("fk_orders_customer").alias("rule"),
        "n_rows",
        F.col("n_orphans").alias("n_violations"),
    )
    return row_local.unionByName(uniq).unionByName(fk).orderBy("rule")
