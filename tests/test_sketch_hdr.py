"""HDR-histogram quantile sketch (operators/sketch.py hdr_*): bucket key
vs a Python replica, lossless merge, the 2^-m relative error bound against
exact percentiles, and the exact small-value region."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import sketch as SK

M, LO = SK.HDR_MBITS, 1 << SK.HDR_MBITS


def _py_key(v: int) -> int:
    if v < LO:
        return v
    e = v.bit_length() - 1
    return e * LO + ((v >> (e - M)) - LO)


def _py_lb(k: int) -> int:
    if k < LO:
        return k
    return ((k % LO) + LO) << ((k // LO) - M)


def _vals_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v long")


def test_bucket_key_matches_python_replica(spark):
    vals = [0, 1, LO - 1, LO, LO + 1, 1000, 2**20 + 12345, 2**40 + 7, 2**62]
    rows = (
        _vals_df(spark, vals)
        .select("v", SK.hdr_bucket_key(F.col("v")).alias("k"))
        .collect()
    )
    for r in rows:
        assert r.k == _py_key(r.v), r


def test_lower_bound_inverts_key_and_bounds_value(spark):
    rng = random.Random(7)
    vals = [rng.randrange(0, 2**48) for _ in range(2000)]
    rows = (
        _vals_df(spark, vals)
        .select(
            "v",
            SK.hdr_lower_bound(SK.hdr_bucket_key(F.col("v"))).alias("lb"),
        )
        .collect()
    )
    for r in rows:
        assert r.lb == _py_lb(_py_key(r.v))
        # lb <= v < lb * (1 + 2^-m) + 1: the bounded relative bucket width
        assert r.lb <= r.v
        assert r.v <= r.lb + (r.lb >> M) + 1


def test_merge_is_lossless(spark):
    rng = random.Random(11)
    vals = [rng.randrange(0, 10**7) for _ in range(5000)]
    df = _vals_df(spark, vals)
    whole = SK.hdr_histogram(df, "v")
    a = SK.hdr_histogram(df.filter("v % 3 = 0"), "v")
    b = SK.hdr_histogram(df.filter("v % 3 != 0"), "v")
    merged = SK.hdr_merge(a, b)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_quantiles_within_relative_bound_of_exact(spark):
    rng = random.Random(13)
    vals = sorted(rng.randrange(1, 10**6) for _ in range(20000))
    hist = SK.hdr_histogram(_vals_df(spark, vals), "v")
    row = SK.hdr_quantiles(hist).collect()[0]
    assert row.n == len(vals)
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        # the sketch reports the lower bound of the bucket holding rank
        # ceil(q*n); the true rank-statistic sits inside that bucket
        import math

        exact = vals[math.ceil(q * len(vals)) - 1]
        lb = getattr(row, name)
        assert lb <= exact <= lb + (lb >> M) + 1, (name, lb, exact)


def test_small_values_are_exact(spark):
    # every value below 2^m is its own bucket: quantiles are EXACT there
    vals = [i % LO for i in range(999)]
    hist = SK.hdr_histogram(_vals_df(spark, vals), "v")
    row = SK.hdr_quantiles(hist).collect()[0]
    svals = sorted(vals)
    import math

    for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        assert getattr(row, name) == svals[math.ceil(q * len(vals)) - 1]


def test_grouped_histogram_bounded_rows(spark):
    rng = random.Random(17)
    df = spark.createDataFrame(
        [(rng.choice("abc"), rng.randrange(0, 2**40)) for _ in range(8000)],
        "g string, v long",
    )
    hist = SK.hdr_histogram(df, "v", ["g"])
    per_group = hist.groupBy("g").count().collect()
    bound = (64 - M) * LO + LO
    for r in per_group:
        assert r["count"] <= bound
