"""Ingest/normalization tests (SURVEY.md §2.1 S1-S8, §2.8.7-8)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from payroll_etl_fastapi_spark.sources import csv_ingest
from payroll_etl_fastapi_spark.schemas import PAYROLL_RAW


def _raw(spark, rows):
    return spark.createDataFrame(rows, schema=PAYROLL_RAW)


BASE = dict(
    emp_id="E1", dept="IT", job_grade="Junior", fte="1.0", month="2025-05",
    gross="100", bonus="0", overtime="0", taxes="23", deductions="0",
    net="77", hours_worked="160", location="HQ", currency="USD",
)


def row(**kw):
    d = dict(BASE)
    d.update(kw)
    return Row(**d)


def test_trim_month_and_coercion(spark):
    df = csv_ingest.normalize(
        _raw(spark, [row(dept="  IT  ", month="2025-05-extra", gross="oops", bonus=None)])
    )
    r = df.first()
    assert r.dept == "IT"
    assert r.month == dt.date(2025, 5, 1)
    assert r.gross == 0.0  # invalid → coerce null → fill 0
    assert r.bonus == 0.0  # missing → fill 0
    assert r.net == 77.0


def test_keep_first_dedupe(spark):
    df = csv_ingest.normalize(
        _raw(
            spark,
            [
                row(month="2025-05", dept="IT"),
                row(month="2025-06", dept="HR"),  # later month: loses keep-first
            ],
        )
    )
    emp = csv_ingest.employee_rows(df).collect()
    assert len(emp) == 1
    assert emp[0].dept == "IT"


def test_dept_rows_sorted_distinct(spark):
    df = csv_ingest.normalize(
        _raw(
            spark,
            [row(emp_id="E1", dept="Sales"), row(emp_id="E2", dept="HR"),
             row(emp_id="E3", dept="Sales")],
        )
    )
    assert [r.dept_name for r in csv_ingest.dept_rows(df).collect()] == ["HR", "Sales"]


def test_reference_csv_counts(spark, reference_csv):
    """Golden row counts from the reference dataset: 5526 facts, 500 emps, 6 depts."""
    df = csv_ingest.normalize(csv_ingest.read_payroll_csv(spark, reference_csv))
    assert df.count() == 5526
    assert csv_ingest.employee_rows(df).count() == 500
    assert csv_ingest.dept_rows(df).count() == 6
