"""Golden end-to-end KPI tests on the reference's own dataset (SURVEY.md §5.2).

Anchors recovered from the reference's shipped screenshots and verified against
data/payroll.csv (BASELINE.md): summary 2025-05, delta 2025-04→2025-05 company
row, anomalies 2025-05 single row E100404 with z = 3.599736014…
"""

from __future__ import annotations

import pytest

from payroll_etl_fastapi_spark.plans import kpi
from payroll_etl_fastapi_spark.sources import csv_ingest


@pytest.fixture(scope="module")
def star(spark, tmp_path_factory, reference_csv):
    from payroll_etl_fastapi_spark.etl import PayrollWarehouse

    wh = PayrollWarehouse(spark, str(tmp_path_factory.mktemp("wh")))
    wh.load_csv(reference_csv)
    return wh.read("fact_payroll"), wh.read("dim_employee"), wh.read("dim_dept")


def test_summary_2025_05(star):
    fact, _, _ = star
    r = kpi.kpi_summary(fact, "2025-05").first()
    assert r.fot == pytest.approx(696994.07, abs=1e-6)
    assert r.taxes == pytest.approx(139358.22, abs=1e-6)
    assert r.gross == pytest.approx(605727.98, abs=1e-6)
    assert r.net == pytest.approx(545892.41, abs=1e-6)
    assert r.fte == pytest.approx(419.6479, abs=1e-3)
    assert r.headcount == 440
    assert r.tax_share == pytest.approx(139358.22 / 605727.98, rel=1e-12)


def test_summary_missing_month_is_null(star):
    fact, _, _ = star
    r = kpi.kpi_summary(fact, "2030-01").first()
    assert r.gross is None  # API layer turns this into 404 (§2.8.4)
    assert r.headcount == 0


def test_delta_company_golden(star):
    fact, emp, dept = star
    company, by_dept = kpi.kpi_delta(fact, emp, dept, "2025-04", "2025-05")
    r = company.first()
    assert r.gross_delta == pytest.approx(-12606.72, abs=1e-6)
    assert r.bonus_delta == pytest.approx(-476.59, abs=1e-6)
    assert r.overtime_delta == pytest.approx(1301.92, abs=1e-6)
    assert r.fot_delta == pytest.approx(-11781.39, abs=1e-6)
    # per-dept deltas sum to company deltas (full-outer + coalesce correctness)
    agg = by_dept.groupBy().sum("gross_delta", "fot_delta").first()
    assert agg[0] == pytest.approx(-12606.72, abs=1e-6)
    assert agg[1] == pytest.approx(-11781.39, abs=1e-6)


def test_anomalies_golden_e100404(star):
    fact, emp, dept = star
    rows = kpi.kpi_anomalies(fact, emp, dept, "2025-05", threshold=3.5, limit=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.emp_id == "E100404"
    assert r.dept == "IT"
    assert r.net == pytest.approx(2987.78, abs=1e-9)
    assert r.median_net == pytest.approx(1362.215, abs=1e-9)
    assert r.mad == pytest.approx(304.59, abs=1e-6)
    assert r.z == pytest.approx(3.599736014, abs=1e-6)


def test_anomalies_dept_filter(star):
    fact, emp, dept = star
    rows = kpi.kpi_anomalies(
        fact, emp, dept, "2025-05", threshold=0.0, limit=10000, dept="IT"
    ).collect()
    assert rows and all(r.dept == "IT" for r in rows)


def test_anomalies_mad_zero_keeps_null_z(spark):
    """Synthetic MAD=0 dept: z is NULL and rows are KEPT (§2.8.3)."""
    import datetime as dt

    m = dt.date(2025, 5, 1)
    fact = spark.createDataFrame(
        [("E%d" % i, m, 100.0) for i in range(4)], "emp_id string, month date, net double"
    )
    emp = spark.createDataFrame([("E%d" % i, 1) for i in range(4)], "emp_id string, dept_id int")
    dept = spark.createDataFrame([(1, "Flat")], "dept_id int, dept_name string")
    rows = kpi.kpi_anomalies(fact, emp, dept, "2025-05", threshold=3.5, limit=10).collect()
    assert len(rows) == 4
    assert all(r.z is None and r.mad == 0.0 for r in rows)


def test_anomalies_limit_before_threshold(spark):
    """A row can be crowded out of top-K by rows later dropped (§2.8.2)."""
    import datetime as dt

    m = dt.date(2025, 5, 1)
    # nets 1,2,3,4,1000 → median 3, MAD 1 → the 1000 is a huge-|z| outlier
    fact = spark.createDataFrame(
        [("A%d" % i, m, float(i + 1)) for i in range(4)] + [("A4", m, 1000.0)],
        "emp_id string, month date, net double",
    )
    emp = spark.createDataFrame([("A%d" % i, 1) for i in range(5)], "emp_id string, dept_id int")
    dept = spark.createDataFrame([(1, "D")], "dept_id int, dept_name string")
    # limit=1 takes only the outlier; threshold=1e9 then drops it → empty,
    # even though NULL-z rows (none here) or smaller |z| rows existed
    rows = kpi.kpi_anomalies(fact, emp, dept, "2025-05", threshold=1e9, limit=1).collect()
    assert rows == []
