"""Upsert operator semantics (SURVEY.md §2.1 S10-S12) + ETL idempotence."""

from __future__ import annotations

from pyspark.sql import Row

from payroll_etl_fastapi_spark.operators.upsert import insert_if_absent, upsert


def test_upsert_update_wins(spark):
    existing = spark.createDataFrame([Row(k="a", v=1), Row(k="b", v=2)])
    updates = spark.createDataFrame([Row(k="b", v=20), Row(k="c", v=30)])
    got = {r.k: r.v for r in upsert(existing, updates, ["k"]).collect()}
    assert got == {"a": 1, "b": 20, "c": 30}


def test_insert_if_absent_existing_wins(spark):
    existing = spark.createDataFrame([Row(k="a", v=1)])
    updates = spark.createDataFrame([Row(k="a", v=99), Row(k="b", v=2)])
    got = {r.k: r.v for r in insert_if_absent(existing, updates, ["k"]).collect()}
    assert got == {"a": 1, "b": 2}


def test_upsert_composite_key(spark):
    existing = spark.createDataFrame([Row(k1="e1", k2=1, v=10), Row(k1="e1", k2=2, v=20)])
    updates = spark.createDataFrame([Row(k1="e1", k2=2, v=99)])
    got = {(r.k1, r.k2): r.v for r in upsert(existing, updates, ["k1", "k2"]).collect()}
    assert got == {("e1", 1): 10, ("e1", 2): 99}


def test_upsert_duplicate_update_keys_deterministic(spark):
    """Duplicate keys inside `updates` (Postgres ON CONFLICT would error) must
    resolve to the same survivor every run: non-key columns tie-break, so the
    smallest tuple wins regardless of shuffle order."""
    existing = spark.createDataFrame([Row(k="a", v=1)])
    updates = spark.createDataFrame([Row(k="a", v=30), Row(k="a", v=20), Row(k="b", v=5)])
    for _ in range(3):
        got = {r.k: r.v for r in upsert(existing, updates, ["k"]).collect()}
        assert got == {"a": 20, "b": 5}


def test_etl_idempotent(spark, tmp_path, reference_csv):
    from payroll_etl_fastapi_spark.etl import PayrollWarehouse

    wh = PayrollWarehouse(spark, str(tmp_path / "wh"))
    c1 = wh.load_csv(reference_csv)
    c2 = wh.load_csv(reference_csv)  # load twice ≡ load once
    assert c1 == c2 == {"dim_dept": 6, "dim_employee": 500, "fact_payroll": 5526}
    # surrogate keys deterministic: 1..6 by sorted dept_name
    depts = wh.read("dim_dept").orderBy("dept_id").collect()
    assert [d.dept_id for d in depts] == list(range(1, 7))
    assert [d.dept_name for d in depts] == sorted(d.dept_name for d in depts)
