"""Unit tests for operators/binning.py — the gate query pins cross-engine
edge parity; these pin the bucket rule and the approx path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.binning import bin_edges, quantile_bins


def test_equal_population_deciles(spark):
    df = spark.range(1000).select(F.col("id").alias("x"))
    binned = quantile_bins(df, F.col("x"), 10)
    counts = {r.bin: r["count"] for r in binned.groupBy("bin").count().collect()}
    assert set(counts) == set(range(10))
    assert all(90 <= c <= 110 for c in counts.values())


def test_ties_go_to_lower_bin(spark):
    # 4 distinct values x 25 copies; quartile edges land ON the values —
    # a row equal to an edge must take the LOWER bin (strict > rule)
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4] for _ in range(25)], "x int")
    binned = quantile_bins(df, F.col("x"), 4)
    got = {
        (r.x, r.bin) for r in binned.select("x", "bin").distinct().collect()
    }
    # each distinct value maps to exactly one bin, monotonically
    bins = dict(sorted(got))
    assert len(bins) == 4
    assert list(bins.values()) == sorted(bins.values())
    assert bins[1] == 0


def test_monotone_bins(spark):
    df = spark.range(500).select((F.col("id") * 7 % 501).alias("x"))
    b = quantile_bins(df, F.col("x"), 8).groupBy("bin").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    rows = sorted((r.bin, r.lo, r.hi) for r in b.collect())
    for (b0, _, hi0), (b1, lo1, _) in zip(rows, rows[1:]):
        assert b1 == b0 + 1 and lo1 > hi0


def test_approx_path_runs(spark):
    df = spark.range(10000).select(F.col("id").alias("x"))
    edges = bin_edges(df, F.col("x"), 10, exact=False)
    assert len(edges) == 9 and edges == sorted(edges)


def test_bad_n_bins(spark):
    df = spark.range(10)
    with pytest.raises(ValueError, match="n_bins"):
        bin_edges(df, F.col("id"), 1)
