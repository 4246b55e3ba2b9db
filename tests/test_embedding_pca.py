"""Tests for operators.embedding: distributed covariance == numpy, PCA
projection == sklearn-style reference math, dim_stats exactness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import embedding as E


@pytest.fixture()
def vecs(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud so PCA has a meaningful top direction
    base = rng.normal(size=(500, 8)) * np.array([5, 3, 1, 1, 0.5, 0.2, 0.1, 0.05])
    rows = [(i, [float(x) for x in base[i]]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(7), base


def test_covariance_matches_numpy(spark, vecs):
    df, X = vecs
    n, mean, cov = E.covariance_stats(df, dim=8)
    assert n == 500
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=0, atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(X, rowvar=False), rtol=1e-9, atol=1e-9)


def test_pca_project_matches_numpy(spark, vecs):
    df, X = vecs
    mean, comps = E.pca_components(df, k=3, dim=8)
    out = E.pca_project(df, mean, comps).collect()
    got = np.array([r.pca for r in sorted(out, key=lambda r: r.vec_id)])
    # reference projection from numpy eigh with the same sign convention
    cov = np.cov(X, rowvar=False)
    vals, vecs_np = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    C = vecs_np[:, order]
    for j in range(3):
        p = np.argmax(np.abs(C[:, j]))
        if C[p, j] < 0:
            C[:, j] = -C[:, j]
    exp = (X - X.mean(axis=0)) @ C
    np.testing.assert_allclose(got, exp, rtol=1e-8, atol=1e-8)
    # the top component captures the dominant (×5) axis
    assert np.argmax(np.abs(C[:, 0])) == 0
    # whitened projections have ~unit variance per component
    _, wc = E.pca_components(df, k=3, dim=8, whiten=True)
    wout = E.pca_project(df, mean, wc).collect()
    W = np.array([r.pca for r in wout])
    np.testing.assert_allclose(W.var(axis=0, ddof=1), np.ones(3), rtol=1e-6)


def test_dim_stats_exact(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [0.5, 0.75])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.dim: r for r in E.dim_stats(df).collect()}
    assert rows[0].n == 2 and rows[0].sum_micros == 1_000_000
    assert rows[1].sum_micros == -250_000 + 750_000
    assert rows[0].sumsq_micros2 == 2 * 500_000 ** 2
    assert rows[1].min_v == -0.25 and rows[1].max_v == 0.75


def test_covariance_rejects_tiny_input(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match=">= 2 vectors"):
        E.covariance_stats(df, dim=2)
