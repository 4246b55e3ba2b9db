"""Approximate-variant tests: bounded error vs the exact operators, and the
approx anomalies plan agreeing with the exact plan on the golden month."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import approx


def test_approx_median_bounded_error(spark):
    df = spark.range(100000).select((F.col("id") % 9973).alias("v"))
    row = df.agg(
        F.expr("percentile(v, 0.5)").alias("exact"),
        approx.approx_median("v", accuracy=10000).alias("approx"),
    ).first()
    # rank error 1/accuracy over 100k rows ⇒ value error ≤ ~10 on this
    # near-uniform distribution; assert a conservative bound
    assert abs(row.approx - row.exact) <= 9973 * 0.01


def test_approx_headcount_bounded_error(spark):
    df = spark.range(50000).select((F.col("id") % 10007).alias("v"))
    row = df.agg(
        F.countDistinct("v").alias("exact"),
        approx.approx_headcount("v", rsd=0.02).alias("approx"),
    ).first()
    assert row.exact == 10007
    assert abs(row.approx - row.exact) / row.exact < 0.06  # 3×rsd


def test_approx_anomalies_matches_exact_on_golden(spark, reference_csv, tmp_path):
    from payroll_etl_fastapi_spark.etl import PayrollWarehouse

    wh = PayrollWarehouse(spark, str(tmp_path / "wh"))
    wh.load_csv(reference_csv)
    fact, emp, dept = (
        wh.read("fact_payroll"),
        wh.read("dim_employee"),
        wh.read("dim_dept"),
    )
    rows = approx.kpi_anomalies_approx(fact, emp, dept, "2025-05", 3.5, 10).collect()
    # the sketch median is an actual element (no linear interpolation), so z
    # shifts slightly — but the same anomaly must surface above threshold
    assert [r.emp_id for r in rows] == ["E100404"]
    assert rows[0].dept == "IT" and abs(rows[0].z) >= 3.5
    # the sketch median is the lower-middle ELEMENT of the even-count group
    # (1332.12) where the exact op interpolates (1362.215) — within 3%
    assert rows[0].median_net == pytest.approx(1362.215, rel=0.03)
