"""Explicit schemas — the Spark analog of the reference's fixed DDL.

The reference declares its star schema up front (/root/reference/src/models.py:4-33)
and only the CSV ingest path is dynamically typed (/root/reference/src/etl.py:8-11).
We mirror that: curated tables always carry an explicit StructType; inference is
reserved for raw ingest, and even there we read strings then coerce deliberately.

NUMERIC → DoubleType decision: the reference computes in Postgres NUMERIC and
coerces to float at the JSON edge (/root/reference/src/api.py:134-137,256-257).
DoubleType end-to-end reproduces every JSON-visible golden (SURVEY.md §5.2) and is
whole-stage-codegen friendly; DecimalType is kept for opt-in exact-sum paths.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Payroll raw CSV (mirrors /root/reference/data/payroll.csv header order).
# All measure columns land as strings and are coerced in sources.csv_ingest —
# that reproduces pandas' to_numeric(errors="coerce") semantics exactly.
# ---------------------------------------------------------------------------
PAYROLL_RAW = T.StructType(
    [
        T.StructField("emp_id", T.StringType()),
        T.StructField("dept", T.StringType()),
        T.StructField("job_grade", T.StringType()),
        T.StructField("fte", T.StringType()),
        T.StructField("month", T.StringType()),
        T.StructField("gross", T.StringType()),
        T.StructField("bonus", T.StringType()),
        T.StructField("overtime", T.StringType()),
        T.StructField("taxes", T.StringType()),
        T.StructField("deductions", T.StringType()),
        T.StructField("net", T.StringType()),
        T.StructField("hours_worked", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("currency", T.StringType()),
    ]
)

# the eight measure columns coerced to double and filled with 0
# (/root/reference/src/etl.py:10-11)
PAYROLL_MEASURES = [
    "gross",
    "bonus",
    "overtime",
    "taxes",
    "deductions",
    "net",
    "fte",
    "hours_worked",
]

# ---------------------------------------------------------------------------
# Star schema (reference: pr.dim_dept / pr.dim_employee / pr.fact_payroll,
# /root/reference/src/models.py:7-32)
# ---------------------------------------------------------------------------
DIM_DEPT = T.StructType(
    [
        T.StructField("dept_id", T.IntegerType(), False),
        T.StructField("dept_name", T.StringType(), False),
    ]
)

DIM_EMPLOYEE = T.StructType(
    [
        T.StructField("emp_id", T.StringType(), False),
        T.StructField("dept_id", T.IntegerType(), False),
        T.StructField("job_grade", T.StringType()),
        T.StructField("location", T.StringType()),
    ]
)

FACT_PAYROLL = T.StructType(
    [
        T.StructField("emp_id", T.StringType(), False),
        T.StructField("month", T.DateType(), False),
        T.StructField("gross", T.DoubleType()),
        T.StructField("bonus", T.DoubleType()),
        T.StructField("overtime", T.DoubleType()),
        T.StructField("taxes", T.DoubleType()),
        T.StructField("deductions", T.DoubleType()),
        T.StructField("net", T.DoubleType()),
        T.StructField("fte", T.DoubleType()),
        T.StructField("hours_worked", T.DoubleType()),
        T.StructField("currency", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md) — declared so reads never rely on
# parquet footer quirks and column pruning starts from a known universe.
# ---------------------------------------------------------------------------
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
