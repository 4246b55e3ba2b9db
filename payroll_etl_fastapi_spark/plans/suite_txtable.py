"""Transactional-table gate query: the full TxTable lifecycle — overwrite,
append, copy-on-write upsert, time travel — run for real every round and
checksummed against a DuckDB oracle that replays the same three logical
states from the source table.

The reference gets atomicity from Postgres (one transaction wraps the whole
load, /root/reference/src/etl.py:15); sources/txtable.py supplies it on
files. This gate makes the commit protocol driver-verified: losing a row in
the upsert rewrite, double-reading after a partial commit, or time-travel
resolving the wrong manifest all flip the correctness row.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from payroll_etl_fastapi_spark.plans.suite import _cents, _sql_cents, _t, query
from payroll_etl_fastapi_spark.sources.txtable import TxTable


@query(
    "txtable_acid_ops",
    oracle=f"""
    WITH li AS (
        -- the synthetic lineitem does NOT enforce (orderkey, linenumber)
        -- uniqueness; make the upsert key real with a deterministic pre-agg
        SELECT l_orderkey, l_linenumber,
               CAST(max({_sql_cents('l_extendedprice')}) AS BIGINT) AS price_cents
        FROM lineitem
        GROUP BY l_orderkey, l_linenumber
    ),
    a AS (SELECT * FROM li WHERE l_orderkey % 5 = 0),
    b AS (SELECT * FROM li WHERE l_orderkey % 5 = 1),
    v2 AS (SELECT * FROM a UNION ALL SELECT * FROM b),
    v3 AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_orderkey % 10 = 0 THEN price_cents * 2
                    ELSE price_cents END AS price_cents
        FROM v2
    )
    SELECT 1 AS version, count(*) AS n_rows,
           CAST(sum(price_cents) AS BIGINT) AS sum_price_cents FROM a
    UNION ALL
    SELECT 2, count(*), CAST(sum(price_cents) AS BIGINT) FROM v2
    UNION ALL
    SELECT 3, count(*), CAST(sum(price_cents) AS BIGINT) FROM v3
    ORDER BY version
    """,
)
def txtable_acid_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run overwrite → append → upsert on a TxTable and report
    (version, n_rows, sum_price_cents) for all three versions via TIME
    TRAVEL after the fact — versions 1 and 2 are read back through their
    manifests after version 3 exists, so the row only matches if old
    snapshots stay intact under later commits and the upsert rewrote
    exactly the doubled keys.

    Scale shape: every read is one multi-path parquet FileScan over the
    manifest's directory list (pushdown/pruning intact); commits are one
    new data directory + one O(#dirs) driver-side JSON swap — no Spark job
    touches the log. See sources/txtable.py."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.max(_cents(F.col("l_extendedprice"))).alias("price_cents"))
    )
    scratch = tempfile.mkdtemp(prefix="spark_txtable_gate_")
    try:
        t = TxTable(spark, scratch + "/t")
        t.overwrite(li.filter(F.col("l_orderkey") % 5 == 0))
        t.append(li.filter(F.col("l_orderkey") % 5 == 1))
        doubled = (
            t.snapshot()
            .filter(F.col("l_orderkey") % 10 == 0)
            .withColumn("price_cents", F.col("price_cents") * 2)
        )
        t.upsert(doubled, ["l_orderkey", "l_linenumber"])
        rows = []
        for v in (1, 2, 3):
            agg = (
                t.snapshot(version=v)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("price_cents").alias("s"),
                )
                .collect()[0]
            )
            rows.append((v, agg["n"], agg["s"]))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("version", T.IntegerType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_price_cents", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
