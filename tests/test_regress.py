"""operators.regress — distributed least squares via normal equations.

Semantics locked here (suite_quality.quality_linear_fit re-checks against
DuckDB at scale): exact integer Gram sums, Cramer closed-form weights,
SSE/R² from the algebraic identity (no second data pass), broadcast apply.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import regress as R


def frame(spark, rows):
    return spark.createDataFrame(rows, "x1 long, x2 long, y long")


def test_exact_plane_is_recovered(spark):
    # y = 3*x1 + 2*x2 + 5 exactly → residual-free fit, r2 == 1
    rows = [(a, b, 3 * a + 2 * b + 5) for a in range(1, 7) for b in range(0, 5)]
    fit = R.linear_fit(
        frame(spark, rows), F.col("x1"), F.col("x2"), F.col("y")
    ).first()
    assert abs(fit.w1 - 3.0) < 1e-9
    assert abs(fit.w2 - 2.0) < 1e-9
    assert abs(fit.w0 - 5.0) < 1e-9
    assert abs(fit.r2 - 1.0) < 1e-12


def test_matches_numpy_lstsq_on_noisy_integers(spark):
    rng = np.random.default_rng(7)
    x1 = rng.integers(1, 50, 200)
    x2 = rng.integers(0, 20, 200)
    y = (4 * x1 + 3 * x2 + 10 + rng.integers(-5, 6, 200)).astype(int)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)]
    fit = R.linear_fit(
        frame(spark, rows), F.col("x1"), F.col("x2"), F.col("y")
    ).first()
    X = np.stack([x1, x2, np.ones_like(x1)], axis=1).astype(float)
    w, *_ = np.linalg.lstsq(X, y.astype(float), rcond=None)
    assert abs(fit.w1 - w[0]) < 1e-6
    assert abs(fit.w2 - w[1]) < 1e-6
    assert abs(fit.w0 - w[2]) < 1e-6
    resid = y - X @ w
    sst = ((y - y.mean()) ** 2).sum()
    assert abs(fit.r2 - (1 - (resid**2).sum() / sst)) < 1e-9


def test_normal_equation_sums_are_exact_integers(spark):
    rows = [(2, 3, 7), (5, 1, 11), (4, 6, 2)]
    s = R.normal_equation_sums(
        frame(spark, rows), F.col("x1"), F.col("x2"), F.col("y")
    ).first()
    assert (s.n, s.s1, s.s2, s.sy) == (3, 11, 10, 20)
    assert s.s11 == 4 + 25 + 16
    assert s.s12 == 6 + 5 + 24
    assert s.s22 == 9 + 1 + 36
    assert s.s1y == 14 + 55 + 8
    assert s.s2y == 21 + 11 + 12
    assert s.syy == 49 + 121 + 4


def test_predict_broadcast_apply(spark):
    rows = [(a, b, 3 * a + 2 * b + 5) for a in range(1, 7) for b in range(0, 5)]
    df = frame(spark, rows)
    fit = R.linear_fit(df, F.col("x1"), F.col("x2"), F.col("y"))
    scored = R.predict(df, F.col("x1"), F.col("x2"), fit)
    for r in scored.collect():
        assert abs(r.y_hat - r.y) < 1e-8  # exact plane → exact predictions
