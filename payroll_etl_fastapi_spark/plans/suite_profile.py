"""Column-profiling gate query: operators/profile.py against a DuckDB oracle
that computes the same statistics as one UNION ALL of per-column aggregates.

The reference's analog is its psql introspection pass
(/root/reference/scripts/inspect_db.py:10-42); this is the engine-native
"look at a new table before you trust it" operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@query(
    "profile_hot_keys",
    oracle="""
    WITH counts AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS n_rows
        FROM events
        GROUP BY 1, 2
    ),
    total AS (SELECT count(*) AS t FROM events)
    SELECT event_type, day, n_rows, n_rows * 10000 // t AS share_bp
    FROM counts, total
    ORDER BY n_rows DESC, event_type, day
    LIMIT 20
    """,
)
def profile_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic (operators.profile.hot_keys): the 20 heaviest
    (event_type, day) partitions of the event stream with their integral
    basis-point share — what you measure BEFORE reaching for the remedies
    in operators/skew.py, because a 40%-share key needs a different plan
    than a long flat tail.

    One grouped count + broadcast one-row total + TakeOrderedAndProject;
    diagnostic cost is one aggregate pass regardless of table size."""
    from payroll_etl_fastapi_spark.operators.profile import hot_keys

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    )
    return hot_keys(e, ["event_type", "day"], top_k=20)


@query(
    "profile_table_fingerprint",
    oracle="""
    WITH h AS (
        SELECT CAST(('0x' || substr(md5(concat_ws(chr(31),
                   coalesce(CAST(c_custkey AS VARCHAR), chr(0) || 'NULL'),
                   coalesce(c_name, chr(0) || 'NULL'),
                   coalesce(CAST(c_nationkey AS VARCHAR), chr(0) || 'NULL'),
                   coalesce(CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                                 AS VARCHAR), chr(0) || 'NULL'),
                   coalesce(c_mktsegment, chr(0) || 'NULL')
               )), 1, 7)) AS BIGINT) AS hv
        FROM customer
    )
    SELECT hv % 16                        AS bucket,
           count(*)                       AS n_rows,
           CAST(sum(hv) AS BIGINT)        AS checksum
    FROM h
    GROUP BY hv % 16
    ORDER BY bucket
    """,
)
def profile_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table fingerprint (operators.profile.table_fingerprint):
    an order-independent md5-sum checksum of the customer table split over
    16 row-hash buckets — two replicas compare 16 rows instead of the
    data, and a mismatched bucket confines the diff to 1/16 of the
    keyspace (the flattened Merkle-tree primitive of Cassandra-style
    repair). Floats are canonicalized to integer CENTS before hashing —
    raw double→string casts are NOT portable across engines, scaled
    integers are; commutative addition makes the checksum independent of
    partitioning, ordering, and retries (the same property every
    integer-sum gate here leans on).

    Scale: pure scan + one ≤16-row aggregate; nothing else moves."""
    from payroll_etl_fastapi_spark.operators.profile import table_fingerprint

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_cents"),
        "c_mktsegment",
    )
    return table_fingerprint(
        c, ["c_custkey", "c_name", "c_nationkey", "bal_cents", "c_mktsegment"]
    )
