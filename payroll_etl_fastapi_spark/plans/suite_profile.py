"""Column-profiling gate query: operators/profile.py against a DuckDB oracle
that computes the same statistics as one UNION ALL of per-column aggregates.

The reference's analog is its psql introspection pass
(/root/reference/scripts/inspect_db.py:10-42); this is the engine-native
"look at a new table before you trust it" operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from payroll_etl_fastapi_spark.operators.profile import profile_columns
from payroll_etl_fastapi_spark.plans.suite import _t, query

_NUM_COLS = {"c_custkey", "c_nationkey", "c_acctbal"}
_STR_COLS = {"c_name", "c_mktsegment"}
_ALL_COLS = ["c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey"]


def _col_select(c: str) -> str:
    num = c in _NUM_COLS
    return f"""
    SELECT '{c}'                                   AS column_name,
           count(*)                                AS n_rows,
           count(*) - count({c})                   AS n_null,
           count(DISTINCT {c})                     AS n_distinct,
           {f'CAST(min({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS num_min,
           {f'CAST(max({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS num_max,
           {f'min({c})' if not num else 'CAST(NULL AS VARCHAR)'}            AS str_min,
           {f'max({c})' if not num else 'CAST(NULL AS VARCHAR)'}            AS str_max,
           {f'CAST(sum(length({c})) AS BIGINT)' if not num else 'CAST(NULL AS BIGINT)'}
                                                   AS sum_len
    FROM customer
    """


@query(
    "profile_customer_columns",
    oracle=" UNION ALL ".join(_col_select(c) for c in _ALL_COLS)
    + " ORDER BY column_name",
)
def profile_customer_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass profile of every customer column: nulls, exact distinct
    counts, numeric min/max, string min/max and total length.

    Scale shape: a single aggregate job — count/min/max/sum are plain
    partial aggregates; the exact COUNT(DISTINCT) columns make Catalyst plan
    one Expand (input × n_cols) feeding a single shuffle, which is the gate
    (exactness) configuration. The 100 TB default is exact_distinct=False =
    approx_count_distinct (HLL++, no Expand) — covered by test_profile, not
    oracle-comparable (sketch estimates are engine-specific by design).
    """
    prof = profile_columns(_t(spark, sf_dir, "customer"), _ALL_COLS)
    return prof.orderBy("column_name")
