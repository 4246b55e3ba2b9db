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


def test_currency_absent_defaults_byn(spark, tmp_path):
    """S5: a CSV whose header genuinely lacks the currency column gets the
    reference's 'BYN' default (/root/reference/scripts/load_once.py:20-21) —
    a schema-pinned read would have silently null-filled it instead."""
    p = str(tmp_path / "no_currency.csv")
    with open(p, "w") as f:
        f.write(
            "emp_id,dept,job_grade,fte,month,gross,bonus,overtime,taxes,"
            "deductions,net,hours_worked,location\n"
            "E1,IT,Junior,1.0,2025-05,100,0,0,23,0,77,160,HQ\n"
        )
    df = csv_ingest.normalize(csv_ingest.read_payroll_csv(spark, p))
    r = df.first()
    assert r.currency == "BYN"
    assert r.gross == 100.0


def test_currency_present_null_stays_null(spark, tmp_path):
    """S5 contrapositive: currency PRESENT but empty is a passthrough null,
    not defaulted (the reference only defaults on column absence)."""
    p = str(tmp_path / "with_currency.csv")
    with open(p, "w") as f:
        f.write(
            "emp_id,dept,job_grade,fte,month,gross,bonus,overtime,taxes,"
            "deductions,net,hours_worked,location,currency\n"
            "E1,IT,Junior,1.0,2025-05,100,0,0,23,0,77,160,HQ,\n"
        )
    df = csv_ingest.normalize(csv_ingest.read_payroll_csv(spark, p))
    assert df.first().currency is None


def test_reference_csv_counts(spark, reference_csv):
    """Golden row counts from the reference dataset: 5526 facts, 500 emps, 6 depts."""
    df = csv_ingest.normalize(csv_ingest.read_payroll_csv(spark, reference_csv))
    assert df.count() == 5526
    assert csv_ingest.employee_rows(df).count() == 500
    assert csv_ingest.dept_rows(df).count() == 6
