"""Bloom-filter semi-join reduction gate: the sideways-information-passing
join (operators/bloom.py) run end to end — build the dim-key Bloom filter
distributed, prune the fact scan with the constant-folded probe BEFORE the
join's Exchange, then run the exact join. The Bloom filter is semantically
transparent (false positives are removed by the real join, false negatives
are impossible), so the oracle is the PLAIN join — any probe/build bug
that drops a matching fact row flips the hash. The perf property (the
filter actually prunes, and prunes before the shuffle) is pinned
separately by tests/test_bloom.py including the plan shape.

Scale contract: the join is hinted MERGE to model the 100 TB regime this
operator exists for — a dimension too big to broadcast — so the plan is a
SortMergeJoin whose fact side is filtered to ~5% before its Exchange by a
16 KiB bitset instead of shuffling all 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import bloom as B
from payroll_etl_fastapi_spark.plans.suite import _msum, _sql_msum, _t, query

_NATION = 7  # 73 / 1500 customers at sf0.01 -> ~5% of orders survive


@query(
    "join_bloom_filtered",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           count(*) AS n_orders,
           {_sql_msum('o.o_totalprice')} AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_nationkey = {_NATION}
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order rollup for one nation's customers, with the fact
    scan Bloom-pruned on the dim's key set before a (deliberately
    non-broadcast) sort-merge join. Result is exactly the plain join's —
    the filter only removes rows the join would reject. NEW in round 4."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == _NATION)
        .select("c_custkey", "c_name")
    )
    words = B.bloom_build(cust, "c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pruned = orders.filter(B.bloom_might_contain(F.col("o_custkey"), words))
    return (
        pruned.join(
            cust.hint("merge"), pruned.o_custkey == cust.c_custkey, "inner"
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _msum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_custkey")
    )
