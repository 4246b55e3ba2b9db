"""Maintenance gate query: small-file compaction, end to end.

The reference rewrites its one table inside a single Postgres transaction
(/root/reference/src/etl.py:15) and never meets file fragmentation; a
file-based 100 TB warehouse meets it constantly (streaming sinks, upserts).
This gate runs sources/compaction.py for real every round: it writes a
deterministic 16-file layout, compacts it to 1 file, and checksums the data
through the rewrite — so a compaction bug that loses/duplicates rows or
stops merging files flips the driver's correctness row, not just a pytest.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from payroll_etl_fastapi_spark.plans.suite import _cents, _sql_cents, _t, query
from payroll_etl_fastapi_spark.sources.compaction import (
    compact_table,
    plan_compaction,
)

_HUGE = 1 << 40  # target_bytes that always plans a single output file


@query(
    "compaction_stats",
    oracle=f"""
    SELECT 16                AS files_before,
           1                 AS files_after,
           count(*)          AS n_rows,
           CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) AS sum_price_cents
    FROM lineitem
    WHERE l_orderkey % 7 = 0
    """,
)
def compaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a lineitem subset fragmented into exactly 16 files, compact it,
    and report (files_before, files_after, rows, checksum) — the oracle pins
    the file counts as literals (the layout is deterministic by construction)
    and recomputes rows+checksum from the source table, so the row only
    matches if compaction preserved every row and actually merged the files.

    Determinism of the 16-file layout: coalesce(1) puts the subset in one
    partition, and round-robin repartition(16) from a single source partition
    leaves every target partition non-empty for any subset ≥16 rows — one
    parquet file per non-empty partition.

    Scale shape: compaction itself is per-leaf-dir coalesce (merge-only, no
    shuffle, no global barrier — each directory rewrites independently), so
    at 100 TB it parallelizes over partitions and never funnels the table
    through one executor. The gate's subset is small by design; the operator
    under test is the real one."""
    sub = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 7 == 0)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )
    scratch = tempfile.mkdtemp(prefix="spark_compaction_gate_")
    path = os.path.join(scratch, "t")
    try:
        sub.coalesce(1).repartition(16).write.mode("overwrite").parquet(path)
        files_before = sum(p.n_files for p in plan_compaction(path, _HUGE))
        compact_table(spark, path, _HUGE)
        files_after = sum(p.n_files for p in plan_compaction(path, _HUGE))
        row = (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(_cents(F.col("l_extendedprice"))).alias("sum_price_cents"),
            )
            .collect()[0]
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("files_before", T.IntegerType()),
            T.StructField("files_after", T.IntegerType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_price_cents", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(files_before, files_after, row["n_rows"], row["sum_price_cents"])],
        schema,
    )
