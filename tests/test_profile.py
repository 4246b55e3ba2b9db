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
