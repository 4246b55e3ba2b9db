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


def test_degenerate_design_nulls_weights_and_emits_det(spark):
    """ADVICE r7: collinear features (x2 = 2*x1 → Gram det = 0) must yield
    NULL weights and det = 0.0 — detectable, not silent Inf/NaN — and the
    oracle's CASE replays identically (the formulas are one Python source)."""
    import duckdb

    from payroll_etl_fastapi_spark.operators import regress as R

    rows = [(i, 2 * i, 3 * i + 1) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    fit = R.linear_fit(df, F.col("x1"), F.col("x2"), F.col("y")).first()
    assert fit.det == 0.0
    assert fit.w1 is None and fit.w2 is None and fit.w0 is None
    assert fit.r2 is None  # diagnostics reference the nulled weights

    # same CASE, same verdict in the oracle's engine
    con = duckdb.connect()
    dbl = ", ".join(
        f"CAST({src} AS DOUBLE) AS {dst}" for dst, src in R._DBL.items()
    )
    got = con.sql(f"""
        WITH f AS (SELECT * FROM (VALUES {", ".join(f"({a},{b},{c})" for a,b,c in rows)}) t(x1, x2, y)),
        sums AS (
            SELECT count(*) AS n, CAST(sum(x1) AS BIGINT) AS s1,
                   CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x1*x2) AS BIGINT) AS s12,
                   CAST(sum(x2*x2) AS BIGINT) AS s22, CAST(sum(x1*y) AS BIGINT) AS s1y,
                   CAST(sum(x2*y) AS BIGINT) AS s2y, CAST(sum(y*y) AS BIGINT) AS syy
            FROM f
        ),
        dbl AS (SELECT *, {dbl} FROM sums)
        SELECT {R.SOLVE_EXPRS['det']} AS det, {R.SOLVE_EXPRS['w1']} AS w1 FROM dbl
    """).fetchone()
    assert got[0] == 0.0 and got[1] is None


def test_non_degenerate_fit_unchanged_by_the_guard(spark):
    """The CASE guard is a no-op for det != 0: the exact-plane fit still
    recovers (3, 2, 5) with r2 == 1 and a nonzero det."""
    from payroll_etl_fastapi_spark.operators import regress as R

    rows = [(i, (i * 7) % 5, 3 * i + 2 * ((i * 7) % 5) + 5) for i in range(1, 12)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    fit = R.linear_fit(df, F.col("x1"), F.col("x2"), F.col("y")).first()
    assert fit.det != 0.0
    assert abs(fit.w1 - 3) < 1e-9 and abs(fit.w2 - 2) < 1e-9 and abs(fit.w0 - 5) < 1e-9
