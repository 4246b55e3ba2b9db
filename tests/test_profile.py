"""Unit tests for operators/profile.py — the gate query pins oracle parity;
these pin null/distinct/min-max semantics and the approx path on crafted
input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.profile import profile_columns


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.5),
            (2, "beta", None),
            (3, None, -2.0),
            (4, "beta", 10.5),
            (5, None, None),
        ],
        "k int, s string, x double",
    )


def _by_col(df):
    return {r.column_name: r for r in df.collect()}

def test_profile_stats(spark, frame):
    prof = _by_col(profile_columns(frame))
    assert set(prof) == {"k", "s", "x"}
    assert all(prof[c].n_rows == 5 for c in prof)

    k = prof["k"]
    assert (k.n_null, k.n_distinct, k.num_min, k.num_max) == (0, 5, 1.0, 5.0)
    assert k.str_min is None and k.sum_len is None

    s = prof["s"]
    assert (s.n_null, s.n_distinct) == (2, 2)  # distinct ignores nulls
    assert (s.str_min, s.str_max) == ("alpha", "beta")
    assert s.sum_len == len("alpha") + len("beta") * 2
    assert s.num_min is None

    x = prof["x"]
    assert (x.n_null, x.n_distinct, x.num_min, x.num_max) == (2, 2, -2.0, 10.5)


def test_column_subset_and_order(spark, frame):
    prof = profile_columns(frame, ["x", "k"])
    assert [r.column_name for r in prof.collect()] == ["x", "k"]


def test_approx_distinct_path(spark, frame):
    prof = _by_col(profile_columns(frame, exact_distinct=False))
    # HLL++ is exact at tiny cardinalities; identical columns otherwise
    assert prof["k"].n_distinct == 5
    assert prof["s"].n_null == 2


def test_unknown_column_raises(spark, frame):
    with pytest.raises(KeyError, match="no column"):
        profile_columns(frame, ["nope"])


def test_single_job_shape(spark, frame):
    """The whole profile is one aggregate: the plan contains no join and no
    more than the Expand that multi-distinct aggregation requires."""
    plan = profile_columns(frame)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_hot_keys_shares_and_tiebreak(spark):
    from payroll_etl_fastapi_spark.operators.profile import hot_keys

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    rows = hot_keys(df, ["k"], top_k=2).collect()
    assert [(r["k"], r["n_rows"], r["share_bp"]) for r in rows] == [
        ("a", 6, 6000),
        ("b", 3, 3000),
    ]


def test_table_fingerprint_order_and_partition_independent(spark):
    from payroll_etl_fastapi_spark.operators.profile import table_fingerprint

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(200)], "id long, name string"
    )
    a = {(r["bucket"]): (r["n_rows"], r["checksum"])
         for r in table_fingerprint(df, ["id", "name"]).collect()}
    shuffled = df.orderBy(F.rand(7)).repartition(13)
    b = {(r["bucket"]): (r["n_rows"], r["checksum"])
         for r in table_fingerprint(shuffled, ["id", "name"]).collect()}
    assert a == b
    assert sum(n for n, _ in a.values()) == 200


def test_table_fingerprint_detects_single_cell_change(spark):
    from payroll_etl_fastapi_spark.operators.profile import table_fingerprint

    base = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "id long, name string"
    )
    changed = spark.createDataFrame(
        [(i, "nameX" if i == 17 else f"name{i}") for i in range(50)],
        "id long, name string",
    )
    a = {r["bucket"]: r["checksum"] for r in table_fingerprint(base, ["id", "name"]).collect()}
    b = {r["bucket"]: r["checksum"] for r in table_fingerprint(changed, ["id", "name"]).collect()}
    diff = {k for k in set(a) | set(b) if a.get(k) != b.get(k)}
    assert 1 <= len(diff) <= 2  # old row's bucket and/or new row's bucket


def test_table_fingerprint_null_vs_literal_null_distinct(spark):
    """('a', NULL) and ('aNULL-ish concat', absent) must not collide: the
    NULL sentinel carries a control byte no real string contains."""
    from payroll_etl_fastapi_spark.operators.profile import table_fingerprint

    x = spark.createDataFrame([("a", None)], "u string, v string")
    y = spark.createDataFrame([("a", "\x00NULL")], "u string, v string")
    cx = [r["checksum"] for r in table_fingerprint(x, ["u", "v"]).collect()]
    cy = [r["checksum"] for r in table_fingerprint(y, ["u", "v"]).collect()]
    assert cx == cy  # sentinel equals the literal control string by design…
    z = spark.createDataFrame([("aNULL", None)], "u string, v string")
    cz = [r["checksum"] for r in table_fingerprint(z, ["u", "v"]).collect()]
    assert cz != cx  # …but concat boundaries cannot shift across columns
