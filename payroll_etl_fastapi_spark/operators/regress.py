"""In-engine model fitting: distributed least-squares via normal equations.

The one linear-model training shape that survives 100 TB without a
parameter server: a single aggregation pass computes the Gram matrix X'X
and moment vector X'y as EXACT integer sums (map-side partial aggregation,
one 1-row reduce — no shuffle of data rows, no iterations, no driver-side
loop over examples), then the weights come out in closed form (Cramer's
rule) as plain double expressions over that one aggregated row — still
inside the plan, so the "fit" is an ordinary DataFrame and composes with
everything else (predict = a select; score = the algebraic identity
SSE = y'y − w'X'y, which needs NO second pass over the data).

Determinism contract (what lets a DuckDB oracle replay the fit exactly):
- feature/label expressions are INTEGER-valued (counts from
  operators.text.quality_components), so every aggregated sum is exact and
  order-independent — no IEEE accumulation drift across partitions;
- the closed-form solve is generated ONCE as a formula string
  (:func:`det3`) and fed verbatim to both Spark (``F.expr``) and the
  oracle SQL, so both engines parse the identical expression tree and
  IEEE double arithmetic produces bit-identical weights.

Reference parity note: the reference app has no ML surface — this module
is part of the training-data-pipeline extension (quality-filter fitting à
la CCNet/fastText-style linear scorers, done Spark-first).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def det3(
    a: str, b: str, c: str,
    d: str, e: str, f: str,
    g: str, h: str, i: str,
) -> str:
    """3×3 determinant as a formula string over named scalar columns.

    | a b c |
    | d e f |  →  a(ei − fh) − b(di − fg) + c(dh − eg)
    | g h i |

    The SAME string is compiled by Spark's and DuckDB's parsers, pinning
    the operation order — the whole cross-engine determinism argument."""
    return (
        f"({a}) * (({e}) * ({i}) - ({f}) * ({h}))"
        f" - ({b}) * (({d}) * ({i}) - ({f}) * ({g}))"
        f" + ({c}) * (({d}) * ({h}) - ({e}) * ({g}))"
    )


# Cramer solve for  A w = b,  A = [[s11,s12,s1],[s12,s22,s2],[s1,s2,n]],
# b = [s1y, s2y, sy], over the double-cast sum columns d11 … dn.
_DET = det3("d11", "d12", "d1", "d12", "d22", "d2", "d1", "d2", "dn")
_W1_NUM = det3("d1y", "d12", "d1", "d2y", "d22", "d2", "dy", "d2", "dn")
_W2_NUM = det3("d11", "d1y", "d1", "d12", "d2y", "d2", "d1", "dy", "dn")
_W0_NUM = det3("d11", "d12", "d1y", "d12", "d22", "d2y", "d1", "d2", "dy")

# degenerate designs (collinear or constant features) have Gram determinant
# exactly 0 — the weights are NULLed rather than silently Inf/NaN, in BOTH
# engines (ADVICE r7: detectable, not divide-by-zero garbage). det itself is
# emitted by linear_fit so callers can inspect near-singularity too.
SOLVE_EXPRS: dict[str, str] = {
    "det": _DET,
    "w1": f"CASE WHEN ({_DET}) = 0.0 THEN NULL ELSE ({_W1_NUM}) / ({_DET}) END",
    "w2": f"CASE WHEN ({_DET}) = 0.0 THEN NULL ELSE ({_W2_NUM}) / ({_DET}) END",
    "w0": f"CASE WHEN ({_DET}) = 0.0 THEN NULL ELSE ({_W0_NUM}) / ({_DET}) END",
}
# diagnostics over the solved row (w1/w2/w0 referenced by name):
#   SSE = y'y − w'X'y   (algebraic identity — no second data pass)
#   R²  = 1 − SSE/SST,  SST = y'y − (Σy)²/n
DIAG_EXPRS: dict[str, str] = {
    "sse": "dyy - (w1 * d1y + w2 * d2y + w0 * dy)",
    "r2": "1.0 - (dyy - (w1 * d1y + w2 * d2y + w0 * dy))"
          " / (dyy - dy * dy / dn)",
}


def normal_equation_sums(
    df: DataFrame, x1: Column, x2: Column, y: Column
) -> DataFrame:
    """One-row frame of the exact integer normal-equation sums for the model
    y ~ w1·x1 + w2·x2 + w0.

    x1/x2/y must be integer-valued expressions; everything here is a BIGINT
    sum of BIGINT products — exact, partition-order-independent, and cheap:
    Catalyst compiles the ten aggregates into one whole-stage-codegen pass
    with map-side partials, so the cluster-wide cost is one scan plus a
    1-row exchange."""
    b = df.select(
        x1.cast("long").alias("x1"),
        x2.cast("long").alias("x2"),
        y.cast("long").alias("y"),
    )
    return b.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )


_DBL = {
    "dn": "n", "d1": "s1", "d2": "s2", "dy": "sy", "d11": "s11",
    "d12": "s12", "d22": "s22", "d1y": "s1y", "d2y": "s2y", "dyy": "syy",
}


def linear_fit(df: DataFrame, x1: Column, x2: Column, y: Column) -> DataFrame:
    """Fit y ~ w1·x1 + w2·x2 + w0 by least squares; returns ONE row:
    (n, s11, s22, syy, w1, w2, w0, r2) — exact integer anchors plus the
    closed-form doubles. The solve happens inside the plan (selects over
    the 1-row aggregate), so the result is a DataFrame like any other."""
    sums = normal_equation_sums(df, x1, x2, y)
    dbl = sums.select(
        "*", *[F.col(src).cast("double").alias(dst) for dst, src in _DBL.items()]
    )
    solved = dbl.select(
        "*", *[F.expr(e).alias(k) for k, e in SOLVE_EXPRS.items()]
    )
    return solved.select(
        "n", "s11", "s22", "syy", "det", "w1", "w2", "w0",
        F.expr(DIAG_EXPRS["r2"]).alias("r2"),
    )


def predict(df: DataFrame, x1: Column, x2: Column, fit: DataFrame) -> DataFrame:
    """Score rows with a fitted model: broadcast-join the 1-row fit frame and
    emit y_hat = w1·x1 + w2·x2 + w0 — the 100 TB apply path (a map-only
    stage; the model rides in as a broadcast literal)."""
    w = F.broadcast(fit.select("w1", "w2", "w0"))
    return df.crossJoin(w).withColumn(
        "y_hat",
        F.col("w1") * x1.cast("double")
        + F.col("w2") * x2.cast("double")
        + F.col("w0"),
    )
