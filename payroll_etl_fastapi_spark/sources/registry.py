"""Testdata catalog — load/register the driver-generated parquet tables.

The reference registers tables via Postgres DDL (/root/reference/src/models.py:36-57);
our catalog is parquet directories resolved lazily so Catalyst sees a plain
FileScan with full pushdown/pruning support.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from payroll_etl_fastapi_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; have {TESTDATA_TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events ts column to plain TIMESTAMP whatever the
    generator shipped: TIMESTAMP(NANOS) files (round 2) are rejected by the
    vectorized reader, so they are read as raw int64 and floor-truncated to
    microseconds (the same truncation DuckDB applies); TIMESTAMP(MICROS)
    files (round 3) arrive as TIMESTAMP_NTZ and are cast — value-preserving
    under the session's pinned UTC timezone — so every downstream operator
    (unix_micros, window(), watermarks) sees one stable type."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
