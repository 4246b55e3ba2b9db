"""Payroll CSV ingest + normalization (SURVEY.md §2.1 S1-S8).

Reference behavior being reproduced (semantics, not mechanism):
- S1 CSV scan:          /root/reference/src/etl.py:7
- S2 trim dept:         /root/reference/src/etl.py:8
- S3 month normalize:   /root/reference/src/etl.py:9 ('YYYY-MM'[:7] + '-01' → date)
- S4 numeric coercion:  /root/reference/src/etl.py:10-11 (invalid → 0, null → 0)
- S5 currency default:  /root/reference/scripts/load_once.py:20-21 ('BYN' if absent)
- S6 dept projection:   /root/reference/src/etl.py:19 (sorted distinct)
- S7 employee dedupe:   /root/reference/src/etl.py:33 (keep-first per emp_id)
- S8 column subsets:    /root/reference/src/etl.py:32-33,49-63

Everything is a built-in column expression — no UDFs — so the whole pipeline stays
inside whole-stage codegen and scales linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from payroll_etl_fastapi_spark.schemas import PAYROLL_MEASURES, PAYROLL_RAW


def read_payroll_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — header CSV, all-string schema (coercion is explicit, below).

    The currency column is dropped from the pinned schema when the file's
    header genuinely lacks it: a schema-pinned read would silently null-fill
    the column, making it impossible for normalize() to apply the reference's
    column-absent 'BYN' default (/root/reference/scripts/load_once.py:20-21).
    The header probe reads only the first line (no inferSchema)."""
    header_cols = set(spark.read.option("header", "true").csv(path).columns)
    schema = PAYROLL_RAW
    if "currency" not in header_cols:
        schema = T.StructType([f for f in PAYROLL_RAW.fields if f.name != "currency"])
    return spark.read.option("header", "true").schema(schema).csv(path)


def normalize(raw: DataFrame) -> DataFrame:
    """S2-S5: trim, month→date, measure coercion with fill-0, currency default.

    Matches the reference quirk that facts never carry measure-nulls
    (SURVEY.md §2.8.8): cast("double") yields null for invalid text, then fill 0.
    """
    df = raw.withColumn("dept", F.trim(F.col("dept")))
    df = df.withColumn(
        "month", F.to_date(F.concat(F.substring(F.col("month"), 1, 7), F.lit("-01")))
    )
    for c in PAYROLL_MEASURES:
        # try_cast ≡ pandas to_numeric(errors="coerce"): malformed → null
        # (plain cast would throw under Spark's default ANSI mode)
        df = df.withColumn(c, F.col(c).try_cast("double"))
    df = df.na.fill(0.0, PAYROLL_MEASURES)
    if "currency" not in raw.columns:
        df = df.withColumn("currency", F.lit("BYN"))
    else:
        # reference's load_once only defaults when the column is absent;
        # present-but-null stays null (pandas passthrough)
        pass
    return df


def dept_rows(normalized: DataFrame) -> DataFrame:
    """S6 — distinct departments in sorted order (feeds surrogate keys)."""
    return normalized.select(F.col("dept").alias("dept_name")).distinct().orderBy("dept_name")


def employee_rows(normalized: DataFrame) -> DataFrame:
    """S7+S8 — one row per employee, keep-first semantics.

    pandas drop_duplicates('emp_id') keeps the first row in file order; we make
    that deterministic and distributed with a row_number over (month, file order
    proxy). The real CSV has a constant dept per employee (SURVEY.md §2.8.7), so
    any stable order reproduces it; for dirty input we pin "first month wins".
    """
    w = Window.partitionBy("emp_id").orderBy(F.col("month").asc_nulls_last())
    return (
        normalized.select("emp_id", "dept", "job_grade", "location", "month")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "month")
    )


def fact_rows(normalized: DataFrame) -> DataFrame:
    """S8 — fact projection at (emp_id, month) grain."""
    return normalized.select(
        "emp_id",
        "month",
        "gross",
        "bonus",
        "overtime",
        "taxes",
        "deductions",
        "net",
        "fte",
        "hours_worked",
        "currency",
    )
