"""Opt-in approximate variants of the exact operators — the 100 TB scale path.

The correctness gate is EXACT (SURVEY.md §7.3): exact `percentile` matches
Postgres `percentile_cont` bit-for-bit and exact `count(DISTINCT)` matches
the reference headcounts. But at 100 TB those are the two most expensive
aggregates in the engine:

- exact percentile is a sort-based agg — every group's values sort;
- exact count-distinct rewrites into a two-phase expand + double shuffle.

These variants trade bounded error for single-pass, mergeable sketches
(GK-quantile / HyperLogLog++), and are deliberately a SEPARATE opt-in API —
nothing in the reference-parity or oracle paths calls them.

| exact | approximate | error knob |
|---|---|---|
| percentile(c, p) | approx_percentile(c, p, accuracy) | accuracy (default 10000) |
| countDistinct(c) | approx_count_distinct(c, rsd) | rsd (default 0.05) |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_median(c: str | Column, accuracy: int = 10000) -> Column:
    """Single-pass mergeable median (Greenwald-Khanna sketch); rank error
    ≤ 1/accuracy of the group size."""
    col = F.col(c) if isinstance(c, str) else c
    return F.percentile_approx(col, 0.5, accuracy)


def approx_headcount(c: str | Column, rsd: float = 0.05) -> Column:
    """HyperLogLog++ distinct count; relative standard deviation `rsd`.
    One ordinary hash-agg pass — no expand, no second shuffle."""
    col = F.col(c) if isinstance(c, str) else c
    return F.approx_count_distinct(col, rsd)


def kpi_anomalies_approx(
    fact: DataFrame,
    dim_employee: DataFrame,
    dim_dept: DataFrame,
    month: str,
    threshold: float = 3.5,
    limit: int = 50,
    dept: str | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """The anomalies plan with sketch medians: the SAME plan as
    plans/kpi.kpi_anomalies (broadcast med/mad joins, top-K then threshold)
    with only the percentile expression swapped — so any fix to the
    load-bearing anomalies semantics applies to both variants by
    construction. Use when per-department value sets no longer fit a
    sort-based agg comfortably."""
    from payroll_etl_fastapi_spark.plans.kpi import kpi_anomalies

    return kpi_anomalies(
        fact,
        dim_employee,
        dim_dept,
        month,
        threshold,
        limit,
        dept,
        median_fn=lambda c: approx_median(c, accuracy),
    )
