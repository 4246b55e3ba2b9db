"""Quantile binning: assign each row to one of n equal-population bins of a
numeric expression — feature bucketing for training pipelines, and exactly
the computation that produces balanced range-partition split points (what
repartitionByRange samples for, done deterministically).

The reference's nearest analog is its MAD robust-z pipeline, which computes
exact medians via percentile_cont (/root/reference/src/api.py:74-88); this
generalizes the two-quantile case to an n-edge lattice.

Scale notes: edge computation is ONE aggregate returning n_bins-1 doubles —
collected to the driver (tiny by construction) and inlined into the
assignment projection, which is embarrassingly parallel (a 9-element array
filter per row, no shuffle). Spark's exact ``percentile`` buffers each
group's values, so on 100 TB the default should be ``exact=False``
(approx_percentile / GK sketch, mergeable, bounded memory) — bin POPULATIONS
then deviate by the sketch's rank error while the semantics are unchanged.
The gate query pins the exact path: Spark ``percentile`` and DuckDB
``quantile_cont`` interpolate identically (verified bit-for-bit on integer
cents at sf0.01 and sf0.1)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_bins", "bin_edges"]


def bin_edges(
    df: DataFrame, expr: Column, n_bins: int, exact: bool = True
) -> list[float]:
    """The n_bins-1 interior quantile edges of ``expr`` (collected: tiny)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    ps = [i / n_bins for i in range(1, n_bins)]
    agg = (
        F.percentile(expr, F.array(*[F.lit(p) for p in ps]))
        if exact
        else F.approx_percentile(expr, F.array(*[F.lit(p) for p in ps]), F.lit(10000))
    )
    return [float(v) for v in df.select(agg.alias("q")).first().q]


def quantile_bins(
    df: DataFrame,
    expr: Column,
    n_bins: int,
    bin_col: str = "bin",
    exact: bool = True,
) -> DataFrame:
    """``df`` plus a ``bin_col`` in [0, n_bins): the rank bucket of ``expr``.

    A row's bin is the count of edges strictly below its value (ties at an
    edge go to the LOWER bin) — the same closed-form both engines can state,
    which is what makes the oracle replay exact."""
    edges = bin_edges(df, expr, n_bins, exact=exact)
    arr = F.array(*[F.lit(e) for e in edges])
    return df.withColumn(bin_col, F.size(F.filter(arr, lambda e: expr > e)))
