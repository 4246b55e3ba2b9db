"""Time-series joins Spark lacks as built-ins: as-of join and banded range join.

No reference counterpart (/root/reference is monthly payroll batch); these are
the training-/event-pipeline extension operators: attaching "the most recent
prior fact" (as-of) and "all facts within a window" (range join) to an event
stream without a quadratic join.

Both are compositions of existing DataFrame ops — no UDFs, no mapPartitions:

- asof_join: tag both sides, union, ONE window over (keys, ts) with
  last/first(ignorenulls) — the merge-asof shape. Exactly one shuffle on the
  join keys; the per-key sort is the same sort a SortMergeJoin would pay, but
  no join explosion and no range predicate rewritten as a cross product.
  This is the plan you want at 100 TB: cost is O(|left|+|right|) rows through
  one exchange.

- range_join_bucketed: equality-join on (key, time-bucket) with each left row
  probing its own and adjacent buckets, then the exact range filter. Turns an
  inequality join (which Catalyst would execute as a broadcast nested loop or
  cross product) into |buckets-probed| equality shuffles — candidates are
  bounded by bucket occupancy, not |left|x|right|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    values: Sequence[str] = ("value",),
    direction: str = "backward",
    tolerance_us: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the single right row with the greatest
    right.ts <= left.ts (direction='backward') or smallest right.ts >= left.ts
    ('forward') within the same `on` keys — pandas merge_asof / DuckDB
    ASOF JOIN semantics, LEFT-outer (unmatched left rows keep nulls).

    Output: all left columns + `<prefix><ts>` (matched right timestamp) +
    `<prefix><v>` for each v in `values`. Ties on right.ts within a key must
    be pre-deduplicated for a deterministic match (same contract as DuckDB's
    ASOF, which assumes a unique ts per key).

    `tolerance_us` (microseconds) nulls out matches farther than the
    tolerance, like merge_asof(tolerance=...)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    # the union/window plumbing mints internal columns and the output mints
    # prefixed ones — an input column with one of those names would produce
    # duplicate/ambiguous columns or silently wrong selection, so fail loudly
    reserved = {"_ts", "_side", "_r_ts", "_m_ts"} | {f"_rv_{v}" for v in values}
    out_names = {f"{prefix}{ts}"} | {f"{prefix}{v}" for v in values}
    clashes = (set(left.columns) | set(right.columns)) & (reserved | out_names)
    if clashes:
        raise ValueError(
            f"asof_join input columns collide with reserved/output names: "
            f"{sorted(clashes)}; rename them or pass a different prefix"
        )
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    left_payload = [c for c in left.columns if c not in on and c != ts]
    l = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(rdt[v]).alias(f"_rv_{v}") for v in values],
        F.lit(None).cast(ldt[ts]).alias("_r_ts"),
    )
    r = right.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in left_payload],
        *[F.col(v).alias(f"_rv_{v}") for v in values],
        F.col(ts).alias("_r_ts"),
    )
    u = l.unionByName(r)
    if direction == "backward":
        # right rows order BEFORE left rows at equal ts (<= includes ties)
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left rows order BEFORE right rows at equal ts (>= includes ties)
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    matched = u.select(
        *on,
        "_ts",
        "_side",
        *left_payload,
        pick("_r_ts").alias("_m_ts"),
        *[pick(f"_rv_{v}").alias(f"{prefix}{v}") for v in values],
    ).filter(F.col("_side") == 1)
    if tolerance_us is not None:
        gap = F.unix_micros(F.col("_ts")) - F.unix_micros(F.col("_m_ts"))
        if direction == "forward":
            gap = -gap
        ok = F.col("_m_ts").isNotNull() & (gap <= F.lit(int(tolerance_us)))
        matched = matched.select(
            *on,
            "_ts",
            *left_payload,
            F.when(ok, F.col("_m_ts")).alias("_m_ts"),
            *[
                F.when(ok, F.col(f"{prefix}{v}")).alias(f"{prefix}{v}")
                for v in values
            ],
        )
    return matched.select(
        *on,
        F.col("_ts").alias(ts),
        *left_payload,
        F.col("_m_ts").alias(f"{prefix}{ts}"),
        *[F.col(f"{prefix}{v}") for v in values],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    lower_us: int = 0,
    upper_us: int = 0,
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with right.ts in
    [left.ts + lower_us, left.ts + upper_us] and equal `on` keys.

    A naive `l.join(r, keys & range-predicate)` makes Catalyst fall back to a
    nested-loop over the key groups; instead both sides are bucketed by
    floor(ts / width) with width = the range span, the left side is exploded
    to its <= 3 candidate buckets (one explode, not a union of three joins),
    and the join is a pure equality join on (keys, bucket) — bounded
    candidates, shuffle on compact keys — before the exact range filter.

    Output: left columns + `<prefix><ts>` and `<prefix><v>` for every other
    right column; inner semantics (left rows with no partner drop out)."""
    if upper_us < lower_us:
        raise ValueError("upper_us must be >= lower_us")
    on = list(on)
    right_out = {f"{prefix}{c}" for c in right.columns if c not in on}
    clashes = (set(left.columns) | set(right.columns)) & ({"_bucket"} | right_out)
    if clashes:
        raise ValueError(
            f"range_join_bucketed input columns collide with reserved/output "
            f"names: {sorted(clashes)}; rename them or pass a different prefix"
        )
    width = max(upper_us - lower_us, 1)

    def _bucket(us_col: F.Column) -> F.Column:
        # exact floor-division for non-negative longs: (x - x%w)/w divides
        # exactly, so the double division cannot round (a bare floor(x/w) on
        # ~1e15-microsecond epochs can land 1 ulp under an integer and floor
        # into the wrong bucket)
        return ((us_col - F.pmod(us_col, F.lit(width))) / F.lit(width)).cast("long")

    l_us = F.unix_micros(F.col(ts))
    # a right row's bucket is unique, and the inclusive range
    # [l+lower, l+lower+width] spans at most two buckets — so each left row
    # probes exactly two buckets and no (left, right) pair can join twice
    base_bucket = _bucket(l_us + F.lit(lower_us))
    lb = left.select(
        *left.columns,
        F.explode(F.array(base_bucket, base_bucket + 1)).alias("_bucket"),
    )
    right_vals = [c for c in right.columns if c not in on and c != ts]
    rb = right.select(
        *on,
        _bucket(F.unix_micros(F.col(ts))).alias("_bucket"),
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_vals],
    )
    r_us = F.unix_micros(F.col(f"{prefix}{ts}"))
    return (
        lb.join(rb, [*on, "_bucket"])
        .filter((r_us >= l_us + F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us)))
        .drop("_bucket")
    )
