"""Time-series resampling: bucket, gap-fill, and last-observation-carried-
forward — the hypertable primitive (TimescaleDB's time_bucket_gapfill +
locf) that turns an irregular event stream into the dense regular grid
downstream aggregation/ML expects.

Scale shape (100 TB of events): bucketing is one grouped aggregate with
map-side combine; the dense grid comes from exploding a per-key
``sequence(min_bucket, max_bucket)`` — rows generated IN the executors,
sized by each key's own span (never a driver-side calendar loop, never a
cross join against a global calendar table); the fill join is a per-key
equality join; LOCF is one window PARTITIONED BY the series key (state
bounded by a single key's grid — the classic bounded-partition window, not
a global sort). A key whose span is pathologically long produces a long
per-key array — callers bound the grid with an explicit time range if
spans are unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value: F.Column,
    bucket: str = "hour",
) -> DataFrame:
    """(key, bucket_ts, v, n_events, is_gap): per-key dense time grid from
    the key's first to last bucket at ``bucket`` granularity; buckets with
    no events carry the previous bucket's value forward (LOCF) and are
    flagged ``is_gap``. ``value`` is the per-bucket aggregate expression
    (pass an integer-exact one — e.g. cents sums — for oracle parity);
    the first bucket of every key always has data, so LOCF never sees a
    leading NULL."""
    step = {"minute": "INTERVAL 1 MINUTE", "hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[bucket]
    b = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bt"),
        )
        .agg(value.alias("v"), F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    grid = (
        b.groupBy("key")
        .agg(F.min("bt").alias("lo"), F.max("bt").alias("hi"))
        .select(
            "key",
            F.explode(F.expr(f"sequence(lo, hi, {step})")).alias("bt"),
        )
    )
    filled = grid.join(b, ["key", "bt"], "left")
    w = Window.partitionBy("key").orderBy("bt")
    return filled.select(
        "key",
        "bt",
        F.last("v", ignorenulls=True).over(w).alias("v"),
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.col("v").isNull().alias("is_gap"),
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, island, start, end, n_intervals): the union of overlapping or
    touching per-key intervals as maximal merged islands — the interval-merge
    primitive (range_agg / island detection) that gap-based sessionization
    cannot express: sessions merge on INACTIVITY GAPS between points, islands
    merge on explicit [start, end) EXTENT overlap, so two long intervals whose
    starts are hours apart still fuse when the first spans the second.

    Classic cummax formulation, one shuffle on the key: order each key's
    intervals by (start, end, tiebreak); an interval opens a NEW island iff
    its start exceeds the running max of all PRECEDING ends (rows-frame
    cummax, excludes current); the running sum of open-flags numbers the
    islands; one grouped aggregate per (key, island) emits extent and size.
    Touching intervals (start == previous end) merge.

    Scale shape: both window passes and the final aggregate reuse the SAME
    hash partitioning on the key — one Exchange total; per-key state is one
    window frame, bounded by that key's interval count. Start/end are plain
    orderable columns (use integer epoch-micros for cross-engine exactness).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col, tiebreak_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("__new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy(key_col, "island").agg(
        F.min(start_col).alias("start"),
        F.max(end_col).alias("end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def rolling_distinct(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """(day, dau, wau, stickiness_bp): per-day distinct entities and the
    TRAILING ``window_days``-day distinct count — rolling DAU/WAU, the
    sliding-window COUNT(DISTINCT) that plain window frames cannot express
    (distinct does not decompose over a moving frame).

    Plan shape, chosen for 100 TB of events:
    1. reduce the raw stream to DISTINCT (day, entity) pairs FIRST — one
       shuffle, output bounded by days × active entities, orders of
       magnitude below event volume;
    2. explode each reduced pair to the ``window_days`` window ends it
       contributes to (array-local ×W fan-out of the REDUCED set — the
       naive range self-join fans out raw events instead);
    3. one grouped exact count-distinct per window end, trimmed to days
       ≤ the stream's max day via a broadcast one-row bound.
    Early days report partial (growing) windows, the standard rolling-DAU
    convention. stickiness = dau/wau in integer basis points (DIV). For
    approximate at extreme cardinality, swap step 3 for the mergeable HLL
    sketch (operators.sketch) — same fan-out skeleton."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = events.select(
        day.alias("day"), F.col(entity_col).alias("entity")
    ).distinct()
    per_day = daily.groupBy("day").agg(
        F.countDistinct("entity").alias("dau")
    )
    bound = daily.agg(F.max("day").alias("max_day"))
    expanded = (
        daily.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("off"),
            "day",
            "entity",
        )
        .select(F.date_add(F.col("day"), F.col("off")).alias("wday"), "entity")
        .crossJoin(F.broadcast(bound))
        .filter(F.col("wday") <= F.col("max_day"))
    )
    rolled = expanded.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("entity").alias("wau")
    )
    return (
        per_day.join(rolled, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 10000 DIV wau").alias("stickiness_bp"),
        )
    )


def rolling_hll_distinct(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    window_days: int = 7,
    corrected: bool = False,
) -> DataFrame:
    """(day, dau_est, wau_est): approximate rolling DAU/WAU from mergeable
    HLL registers — the 100 TB swap `rolling_distinct` names: identical
    fan-out skeleton, but what fans out is the per-day REGISTER SET
    (≤ HLL_M = 256 rows/day) instead of the distinct-entity set.

    Why this is the scale path: the exact version explodes days × active
    entities × W rows into a count-distinct shuffle — at a billion DAU the
    windowed distinct dominates the job. Here each day is first reduced to
    its register rows (one grouped max with map-side combine, register
    build is rho-max and therefore needs NO pre-distinct), the ×W fan-out
    touches ≤ 256·W rows per day TOTAL, and the window merge is a
    bucket-wise max — HLL merge is lossless, so the rolled registers equal
    the single-pass registers of the true 7-day window exactly (pinned by
    test). Error is the standard ~1.04/√256 ≈ 6.5% regardless of scale."""
    from payroll_etl_fastapi_spark.operators import sketch as SK

    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    keyed = events.select(day.alias("day"), F.col(entity_col).alias("entity"))
    regs = SK.hll_registers(keyed, "entity", ["day"])
    bound = keyed.agg(F.max("day").alias("max_day"))
    # ONE fan-out pass carrying `off`: the off=0 slice is exactly the day's
    # own register set, so DAU and WAU come out of a single grouped frame —
    # no cache (nothing pinned for the session lifetime) and no second
    # events scan for the DAU branch
    merged = (
        regs.select(
            F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
            "day",
            "bucket",
            "rho",
        )
        .select(
            F.date_add(F.col("day"), F.col("off")).alias("day"), "off", "bucket", "rho"
        )
        .crossJoin(F.broadcast(bound))
        .filter(F.col("day") <= F.col("max_day"))
        .groupBy("day", "bucket")
        .agg(
            F.max("rho").alias("rho_w"),
            F.max(F.when(F.col("off") == 0, F.col("rho"))).alias("rho_d"),
        )
    )
    # inline raw-HLL estimator (same expression shape as sketch.hll_estimate,
    # so the SQL oracle replays it bit-for-bit): integer harmonic sum, one
    # IEEE division per estimate, micro-snapped
    w, m = SK.HLL_WBITS, SK.HLL_M
    num = F.lit(2.0 * SK.hll_alpha_m2())
    scale2 = F.lit(2 * (1 << w))
    s_w = F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w} + 1 - rho_w)"))
    n_w = F.count(F.lit(1))
    s_d = F.sum(
        F.expr(
            f"CASE WHEN rho_d IS NOT NULL THEN shiftleft(CAST(1 AS BIGINT), {w} + 1 - rho_d) ELSE CAST(0 AS BIGINT) END"
        )
    )
    n_d = F.count(F.col("rho_d"))

    def _snapped(s, n):
        s_int = (s + (F.lit(m) - n) * scale2).cast("double")
        return F.floor((num / s_int) * 1000000 + F.lit(0.5)) / 1000000.0

    # Emit only days that actually had events (≥1 off=0 register): the ×W
    # fan-out reaches every day within `window_days` after an active day, so
    # without this filter a gap day would surface with rho_d all NULL and a
    # bogus empty-register DAU estimate (and diverge from the inner-join
    # semantics of the exact twin + the SQL oracle). Gap-day case is pytest-
    # pinned in tests/test_sketch_hll.py (test_rolling_hll_gap_day_emits_
    # only_active_days).
    agged = merged.groupBy("day").agg(
        _snapped(s_d, n_d).alias("dau_est"),
        _snapped(s_w, n_w).alias("wau_est"),
        n_d.alias("_n_d"),
        n_w.alias("_n_w"),
    ).filter(F.col("_n_d") > 0)
    if corrected:
        # production read path (measured, tools/sketch_quality.py + PLANS.md
        # §sketch accuracy): typical DAU sits BELOW the raw estimator's
        # 2.5·m = 640 design range, where raw bias reached +76% at n=150 on
        # this very data — apply Flajolet's LinearCounting m·ln(m/V) per
        # day/window exactly as sketch.hll_estimate_corrected does. The
        # driver gate keeps corrected=False: ln() is not guaranteed last-bit
        # identical across engines, so the raw estimator stays the
        # oracle-replayable form; accuracy floors live in pytest instead.
        md = F.lit(float(m))

        def _lc(est, n_used):
            v = (F.lit(m) - n_used).cast("double")
            lc = md * F.log(md / v)
            return F.when((est <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(est)

        agged = agged.select(
            "day",
            _lc(F.col("dau_est"), F.col("_n_d")).alias("dau_est"),
            _lc(F.col("wau_est"), F.col("_n_w")).alias("wau_est"),
            "_n_d",
            "_n_w",
        )
    return agged.drop("_n_d", "_n_w")


def ewma_fold(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """(keys..., n_obs, ewma): exponential smoothing s_t = (s_{t-1} + v_t)
    DIV 2 (α = 1/2) folded left-to-right over each key's observations in
    ``order_col`` order — the monitoring/forecast-baseline primitive that
    is inherently SEQUENTIAL: no window frame or associative aggregate can
    express it, so it runs as an array-local fold.

    Determinism contract: values must be non-negative INTEGERS (scale
    cents/micros first) — then the fold is pure integer arithmetic,
    bit-identical across engines and partition layouts; α = 1/2 keeps every
    intermediate an exact integer DIV. ``order_col`` must be unique within
    a key (bucket first).

    Scale shape: one grouped collect per key AFTER the caller has bucketed
    the series (e.g. hourly sums per (entity, day) — ≤ 24 elements), so
    per-key state is the BUCKET count, never raw event volume; the fold is
    a row-local array expression inside codegen, no shuffle beyond the one
    grouped aggregate, no Python."""
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v"))
        )
    )
    g = df.groupBy(*key_cols).agg(arr.alias("a"))
    vals = F.transform(F.col("a"), lambda s: s["v"])
    # shiftright, not `/ 2`: IEEE double division loses exactness once
    # acc + x exceeds 2^53, silently diverging from an integer `//` replay;
    # a right shift is exact for every non-negative long
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("long"),
        lambda acc, x: F.shiftright((acc + x).cast("long"), 1),
    )
    return g.select(
        *key_cols, F.size("a").cast("long").alias("n_obs"), ewma.alias("ewma")
    )


def seasonal_decompose(
    series: DataFrame,
    key_col: str = "key",
    idx_col: str = "t",
    val_col: str = "y",
    period: int = 24,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method STL refines; statsmodels' seasonal_decompose) over a DENSE
    integer series — trend via the centered 2xP moving average, seasonal
    via mean-centered per-phase averages of the detrended values,
    remainder as what's left. INTEGER-EXACT throughout so the SQL oracle
    replays every cell: quantities carry a fixed denominator of 2*period
    ("q-units") — trend_q = the two staggered P-window sums added
    (exactly the 2xP MA numerator), detrended_q = 2P*y - trend_q,
    per-phase means and the seasonal centering use integral division
    (truncation toward zero — verified identical in Spark `div` and
    DuckDB `//` for negatives). Rows whose centered window is incomplete
    (the first/last P/2 points) carry NULL trend/remainder, the classical
    edge behavior.

    ``series`` must be gap-free per key with consecutive integer
    ``idx_col`` (resample_locf / a dense grid produces it) and integer
    ``val_col`` — feed counts or micro-snapped values.

    Output: (key, t, y, trend_q, seasonal_q, remainder_q) — divide
    q-columns by 2*period for display.

    Scale shape (100 TB): ONE exchange on the series key feeds both
    staggered window sums AND the phase rollup (the events_sessionization
    partitioning-reuse discipline); the per-(key, phase) seasonal table is
    period rows per key, broadcast back. No global sort, no driver loop."""
    if period < 2 or period % 2:
        raise ValueError(f"period must be an even integer >= 2, got {period}")
    half = period // 2
    w = Window.partitionBy(key_col).orderBy(idx_col)
    s1 = w.rowsBetween(-half, half - 1)
    s2 = w.rowsBetween(-half + 1, half)
    y = F.col(val_col).cast("long")
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(idx_col).cast("long").alias("t"),
        y.alias("y"),
        F.when(
            (F.count(F.lit(1)).over(s1) == period)
            & (F.count(F.lit(1)).over(s2) == period),
            F.sum(y).over(s1) + F.sum(y).over(s2),
        ).alias("trend_q"),
    ).withColumn(
        "detr_q",
        F.when(
            F.col("trend_q").isNotNull(),
            F.lit(2 * period) * F.col("y") - F.col("trend_q"),
        ),
    ).withColumn("phase", F.col("t") % period)
    raw = (
        base.filter(F.col("detr_q").isNotNull())
        .groupBy("key", "phase")
        .agg(
            F.expr("CAST(sum(detr_q) div count(1) AS BIGINT)").alias("raw_q")
        )
    )
    adjust = raw.groupBy("key").agg(
        F.expr(f"CAST(sum(raw_q) div {period} AS BIGINT)").alias("adj_q")
    )
    seasonal = raw.join(adjust, "key").select(
        "key", "phase", (F.col("raw_q") - F.col("adj_q")).alias("seasonal_q")
    )
    return (
        base.join(F.broadcast(seasonal), ["key", "phase"], "left")
        .select(
            "key",
            "t",
            "y",
            "trend_q",
            F.coalesce(F.col("seasonal_q"), F.lit(0)).alias("seasonal_q"),
            (F.col("detr_q") - F.coalesce(F.col("seasonal_q"), F.lit(0))).alias(
                "remainder_q"
            ),
        )
    )
