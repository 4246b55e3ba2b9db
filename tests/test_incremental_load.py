"""Incremental-load semantics (SURVEY.md §7.3 hard part 3): a second batch
with new departments, changed employees, and new/updated facts must behave
like the reference's ON CONFLICT upserts + SERIAL dept ids."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.etl import PayrollWarehouse
from payroll_etl_fastapi_spark.sources import csv_ingest


def _batch(spark, rows):
    """rows: (emp_id, dept, month, gross, net) → normalized frame."""
    df = spark.createDataFrame(
        [
            (e, d, m, str(g), "0", "0", "0", "0", str(n), "1", "160", "USD", "G1", "HQ")
            for e, d, m, g, n in rows
        ],
        "emp_id string, dept string, month string, gross string, bonus string, "
        "overtime string, taxes string, deductions string, net string, fte string, "
        "hours_worked string, currency string, job_grade string, location string",
    )
    return csv_ingest.normalize(df)


@pytest.fixture()
def warehouse(spark, tmp_path):
    wh = PayrollWarehouse(spark, str(tmp_path / "wh"))
    wh.load_frames(
        _batch(
            spark,
            [
                ("E1", "Alpha", "2025-01", 100, 80),
                ("E2", "Beta", "2025-01", 200, 160),
                ("E3", "Beta", "2025-01", 300, 240),
            ],
        )
    )
    return wh


def test_initial_dept_ids_are_sorted_serials(warehouse):
    depts = {r.dept_name: r.dept_id for r in warehouse.read("dim_dept").collect()}
    assert depts == {"Alpha": 1, "Beta": 2}


def test_new_dept_appends_after_max_id(spark, warehouse):
    # second batch: E2 moves to a brand-new dept; another new dept arrives too
    warehouse.load_frames(
        _batch(
            spark,
            [
                ("E2", "Gamma", "2025-02", 210, 170),
                ("E4", "Aardvark", "2025-02", 50, 40),
            ],
        )
    )
    depts = {r.dept_name: r.dept_id for r in warehouse.read("dim_dept").collect()}
    # existing ids stable; new depts get max+row_number in sorted-name order —
    # Aardvark sorts before Gamma but must NOT displace existing ids
    assert depts == {"Alpha": 1, "Beta": 2, "Aardvark": 3, "Gamma": 4}


def test_type1_scd_employee_and_fact_upsert(spark, warehouse):
    warehouse.load_frames(
        _batch(
            spark,
            [
                ("E2", "Gamma", "2025-02", 210, 170),   # dept change (type-1)
                ("E1", "Alpha", "2025-01", 999, 888),   # fact overwrite same month
            ],
        )
    )
    depts = {r.dept_id: r.dept_name for r in warehouse.read("dim_dept").collect()}
    emp = {r.emp_id: depts[r.dept_id] for r in warehouse.read("dim_employee").collect()}
    assert emp["E2"] == "Gamma"          # overwritten, not duplicated
    assert emp["E1"] == "Alpha"
    fact = warehouse.read("fact_payroll")
    assert fact.count() == 4             # 3 original + 1 new (E2 Feb); E1 Jan replaced
    e1 = fact.filter(
        (F.col("emp_id") == "E1") & (F.col("month") == F.lit(dt.date(2025, 1, 1)))
    ).collect()
    assert len(e1) == 1 and e1[0].gross == 999.0


def test_untouched_months_survive_incremental_merge(spark, warehouse):
    before = warehouse.read("fact_payroll").filter(
        F.col("month") == F.lit(dt.date(2025, 1, 1))
    ).count()
    warehouse.load_frames(_batch(spark, [("E9", "Beta", "2025-03", 10, 8)]))
    after = warehouse.read("fact_payroll")
    assert after.filter(F.col("month") == F.lit(dt.date(2025, 1, 1))).count() == before
    assert after.filter(F.col("month") == F.lit(dt.date(2025, 3, 1))).count() == 1
