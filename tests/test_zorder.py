"""Tests for operators/zorder.py: interleave correctness vs a Python
reference, SQL/Spark builder lockstep (gated too), and the actual payoff —
z-ordered files have tight per-file min/max ranges in BOTH dimensions,
which is what makes 2-D predicate pruning work."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.zorder import (
    zorder_frame,
    zorder_write,
    zvalue,
)


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_and_is_bijective(spark):
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], 5).alias("z")
        ).collect()
    }
    assert all(got[(x, y)] == _morton_py(x, y, 5) for x, y in pts)
    assert len(set(got.values())) == len(pts)  # bijective on the domain


def test_zvalue_validations():
    with pytest.raises(ValueError, match=">= 2"):
        zvalue([F.col("x")], 8)
    with pytest.raises(ValueError, match="signed long"):
        zvalue([F.col("x"), F.col("y")], 32)


def _file_ranges(spark, path, col):
    """Per-parquet-file (min, max) of col, via the file-name pseudo column."""
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    return [
        (r.lo, r.hi)
        for r in df.groupBy("__f").agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()
    ]


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    """A table sorted by x alone has full-range y spread in every file; the
    z-ordered layout keeps the average per-file spread narrow in BOTH x and
    y — the footer-stat selectivity a 2-D predicate prunes with."""
    n, files = 40000, 16
    df = spark.range(n).select(
        (F.col("id") * 48271 % 65537 % 1000).alias("x"),
        (F.col("id") * 16807 % 65537 % 1000).alias("y"),
    )
    base = str(tmp_path)
    x_sorted = os.path.join(base, "xsort")
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.parquet(x_sorted)
    z_sorted = os.path.join(base, "zsort")
    zorder_write(df, z_sorted, ["x", "y"], bits=10, n_files=files)

    def avg_spread(path, col):
        rs = _file_ranges(spark, path, col)
        return sum(hi - lo for lo, hi in rs) / len(rs)

    # x-sorted layout: x tight, y useless (≈ full 0..999 range per file)
    assert avg_spread(x_sorted, "y") > 900
    # z-ordered: BOTH dimensions well under half the full range per file
    zx, zy = avg_spread(z_sorted, "x"), avg_spread(z_sorted, "y")
    assert zx < 500 and zy < 500, (zx, zy)
    # and the data survived the round trip
    assert spark.read.parquet(z_sorted).count() == n


def _plan_str(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_zorder_frame_approx_path_has_no_global_window(spark):
    """The 100 TB default (sketch ranks) must never plan a Window — the exact
    path's percent_rank over Window.orderBy serializes the whole table
    through one partition per column, which is exactly what exact=False
    exists to avoid."""
    df = spark.range(5000).select(
        (F.col("id") * 48271 % 65537 % 1000).alias("x"),
        (F.col("id") * 16807 % 65537 % 1000).alias("y"),
    )
    approx = zorder_frame(df, ["x", "y"], bits=8)
    assert "Window" not in _plan_str(approx)
    exact = zorder_frame(df, ["x", "y"], bits=8, exact=True)
    assert "Window" in _plan_str(exact)
    # both paths produce a full-coverage z column over the same rows
    assert approx.count() == 5000
    assert approx.filter(F.col("__z").isNull()).count() == 0


def test_zorder_approx_layout_prunes_2d_box(spark, tmp_path):
    """Min/max-pruning payoff on the approx path: for a small 2-D box
    predicate, most z-ordered files' footer ranges must not overlap the box
    (an x-sorted layout would overlap in y for every file)."""
    n, files = 40000, 16
    df = spark.range(n).select(
        (F.col("id") * 48271 % 65537 % 1000).alias("x"),
        (F.col("id") * 16807 % 65537 % 1000).alias("y"),
    )
    path = os.path.join(str(tmp_path), "zapprox")
    zorder_write(df, path, ["x", "y"], bits=10, n_files=files)  # default approx
    xr = _file_ranges(spark, path, "x")
    yr = _file_ranges(spark, path, "y")
    overlapping = sum(
        1
        for (xlo, xhi), (ylo, yhi) in zip(xr, yr)
        if xhi >= 100 and xlo <= 160 and yhi >= 700 and ylo <= 760
    )
    assert len(xr) >= files // 2
    assert overlapping <= len(xr) // 2, (overlapping, len(xr))


def test_zorder_sketch_path_rejects_oversized_bits(spark):
    df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
    with pytest.raises(ValueError, match="sketch"):
        zorder_frame(df, ["x", "y"], bits=16)
