"""Windowed event analytics for the driver gate: sessionization (gap-based
session windows via lag + running sum) and sliding time windows — the batch
twins of the Structured Streaming operators in streaming/events.py, each with
a DuckDB oracle.

Determinism: all time arithmetic is integer epoch-microseconds (Spark
unix_micros ≡ DuckDB epoch_us); per-user ordering carries event_id as a
tiebreak; every aggregate is an integer sum/count or a value-cents sum."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.plans.suite import _msum, _sql_msum, _t, query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@query(
    "events_sessionization",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM flagged
    ),
    per_session AS (
        SELECT user_id, session_idx,
               count(*) AS n_events,
               max(us) - min(us) AS duration_us
        FROM sessions GROUP BY user_id, session_idx
    )
    SELECT user_id,
           count(*)                AS n_sessions,
           CAST(sum(n_events) AS BIGINT)    AS n_events,
           CAST(sum(duration_us) AS BIGINT) AS total_duration_us,
           max(n_events)           AS longest_session_events
    FROM per_session
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session flag →
    running sum = session index — the batch expression of session windows;
    the streaming twin is streaming/events.py session_window path.

    Scale: one shuffle on user_id serves both window functions AND the final
    per-user aggregate (same partitioning reused across stages)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("duration_us").alias("total_duration_us"),
            F.max("n_events").alias("longest_session_events"),
        )
        .orderBy("user_id")
    )


@query(
    "events_sliding_window",
    oracle=f"""
    WITH e AS (
        SELECT event_type, value, epoch_us(ts) AS us FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    ),
    exploded AS (
        SELECT event_type, value,
               (us // 1800000000 - k) * 1800000000 AS ws_us
        FROM e, (SELECT unnest([0, 1]) AS k)
    )
    SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)            AS n_events,
           {_sql_msum('value')} AS total_value
    FROM exploded
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-min windows via the built-in F.window — each event
    lands in exactly two windows. The oracle replays the same epoch-aligned
    bucket arithmetic (Spark aligns window starts to the epoch).

    This is the batch twin of the streaming sliding rollup; in streaming the
    identical expression runs incrementally under a watermark."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _msum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


_FUNNEL_STEPS = ["view", "click", "purchase"]


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id AS u, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
        SELECT e.user_id AS u, max(s1.t1) AS t1, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t1
        WHERE e.event_type = 'click' GROUP BY 1
    ),
    s3 AS (
        SELECT e.user_id AS u, max(s2.t1) AS t1, max(s2.t2) AS t2, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t2
        WHERE e.event_type = 'purchase' GROUP BY 1
    ),
    n1 AS (SELECT count(*) AS n FROM s1),
    rows_ AS (
        SELECT 1 AS step_idx, 'view' AS step,
               (SELECT count(*) FROM s1) AS n_users,
               CAST(0 AS BIGINT) AS sum_lag
        UNION ALL
        SELECT 2, 'click', (SELECT count(*) FROM s2),
               (SELECT coalesce(sum(epoch_ms(t2) - epoch_ms(t1)), 0) FROM s2)
        UNION ALL
        SELECT 3, 'purchase', (SELECT count(*) FROM s3),
               (SELECT coalesce(sum(epoch_ms(t3) - epoch_ms(t1)), 0) FROM s3)
    )
    SELECT step_idx, step,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_users * 10000 // (SELECT n FROM n1) AS BIGINT) AS conv_bp,
           CAST(CASE WHEN n_users = 0 THEN 0
                     ELSE sum_lag // n_users END AS BIGINT) AS avg_lag_ms
    FROM rows_ ORDER BY step_idx
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (operators.funnel.funnel_counts): users completing
    view → click → purchase in strict temporal order (first qualifying
    chain), with basis-point conversion vs step 1 and integer-divided
    average step-1→step-k lag in milliseconds. The product-analytics
    primitive; all-integer outputs, so the oracle replays the whole funnel.

    Scale shape (100 TB): each step is one user-keyed equality join of the
    filter-pushed step slice against the previous step's (user, times)
    frame — the user-hash exchange is reusable across the chain; grouped
    mins are map-side combined; no window over all events, no per-user
    event arrays, no Python. NEW in round 4 (post-tail); round-5 rotation
    candidate."""
    from payroll_etl_fastapi_spark.operators import funnel as FN

    events = _t(spark, sf_dir, "events")
    return FN.funnel_counts(events, _FUNNEL_STEPS)


@query(
    "events_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id AS u, min(ts) AS t0 FROM events GROUP BY 1),
    a AS (
        SELECT e.user_id AS u,
               strftime(date_trunc('week', f.t0), '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', CAST(f.t0 AS DATE), CAST(e.ts AS DATE))
                    // 7 AS INT) AS offset_week
        FROM events e JOIN f ON e.user_id = f.u
    ),
    c AS (
        SELECT cohort_week, offset_week, count(DISTINCT u) AS n_users
        FROM a GROUP BY 1, 2
    ),
    b AS (SELECT cohort_week, n_users AS n0 FROM c WHERE offset_week = 0)
    SELECT c.cohort_week, c.offset_week,
           CAST(c.n_users AS BIGINT) AS n_users,
           CAST(c.n_users * 10000 // b.n0 AS BIGINT) AS retention_bp
    FROM c JOIN b USING (cohort_week)
    ORDER BY cohort_week, offset_week
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators.funnel.cohort_retention): users
    cohorted by the Monday-truncated week of their first event; per later
    week offset, distinct active cohort members and basis-point retention
    vs the cohort's size — the standard product-analytics retention
    triangle. Integer week arithmetic end to end, so the oracle replays
    cohorts, offsets, and retention exactly. One grouped min + one
    user-keyed join + one two-level distinct-count; cohort denominators
    broadcast. NEW in round 4 (post-tail); round-5 rotation candidate."""
    from payroll_etl_fastapi_spark.operators import funnel as FN

    events = _t(spark, sf_dir, "events")
    return FN.cohort_retention(events)


@query(
    "events_resample_gapfill",
    oracle="""
    WITH sel AS (
        SELECT user_id AS u, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE user_id % 30 = 0
    ),
    b AS (
        SELECT u, date_trunc('hour', ts) AS bt, sum(cents) AS v, count(*) AS n
        FROM sel GROUP BY 1, 2
    ),
    span AS (SELECT u, min(bt) AS lo, max(bt) AS hi FROM b GROUP BY 1),
    grid AS (
        SELECT u, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bt
        FROM span
    ),
    f AS (
        SELECT g.u, g.bt, b.v, coalesce(b.n, 0) AS n, b.v IS NULL AS isgap
        FROM grid g LEFT JOIN b ON g.u = b.u AND g.bt = b.bt
    )
    SELECT u AS user_id,
           strftime(bt, '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           CAST(last_value(v IGNORE NULLS)
                OVER (PARTITION BY u ORDER BY bt) AS BIGINT) AS v_cents,
           CAST(n AS BIGINT) AS n_events,
           isgap AS is_gap
    FROM f ORDER BY user_id, bucket_ts
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + gap-fill + LOCF (operators.timeseries.
    resample_locf): the TimescaleDB time_bucket_gapfill/locf primitive —
    every 30th user's event stream densified to an hourly grid from their
    first to last active hour, empty hours carrying the last value forward
    and flagged. Integer cents values, so the oracle replays bucketing,
    grid generation, the fill join, and LOCF exactly.

    Scale shape (100 TB): grid rows are generated IN the executors by
    per-key sequence() explode (sized by each key's own span — no driver
    calendar, no global-calendar cross join); LOCF is a window PARTITIONED
    by the series key (bounded state, never a global sort). NEW in round 4
    (post-tail); round-5 rotation candidate."""
    from payroll_etl_fastapi_spark.operators import timeseries as TS
    from payroll_etl_fastapi_spark.plans.suite import _cents

    events = _t(spark, sf_dir, "events").filter(F.col("user_id") % 30 == 0)
    out = TS.resample_locf(
        events, "user_id", "ts", F.sum(_cents(F.col("value"))), bucket="hour"
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.date_format("bt", "yyyy-MM-dd HH:mm:ss").alias("bucket_ts"),
        F.col("v").cast("long").alias("v_cents"),
        "n_events",
        "is_gap",
    ).orderBy("user_id", "bucket_ts")


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    p AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    ),
    t AS (SELECT from_type, sum(n) AS row_total FROM p GROUP BY 1)
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n,
           CAST(p.n * 10000 // t.row_total AS BIGINT) AS row_bp
    FROM p JOIN t USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event journeys
    (operators.funnel.transition_matrix): for every consecutive event pair
    within a user's timeline, the observed next-step distribution in
    integer basis points — the journey-analysis complement to the funnel.
    One user-partitioned window (bounded per-user state, explicit event_id
    tiebreak for a total order) + one grouped count (≤ |types|² rows) +
    one broadcast row-total attach; exact integers, so the oracle replays
    the matrix bit-for-bit. NEW in round 4 (post-tail); round-5 rotation
    candidate."""
    from payroll_etl_fastapi_spark.operators import funnel as FN

    events = _t(spark, sf_dir, "events")
    return FN.transition_matrix(events)


@query(
    "events_rolling_distinct",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                        user_id AS entity
        FROM events
    ),
    per_day AS (
        SELECT day, count(DISTINCT entity) AS dau FROM daily GROUP BY day
    ),
    bound AS (SELECT max(day) AS max_day FROM daily),
    expanded AS (
        SELECT day + CAST(i AS INTEGER) AS wday, entity
        FROM daily, range(0, 7) AS r(i), bound
        WHERE day + CAST(i AS INTEGER) <= max_day
    ),
    rolled AS (
        SELECT wday AS day, count(DISTINCT entity) AS wau
        FROM expanded GROUP BY wday
    )
    SELECT strftime(p.day, '%Y-%m-%d') AS day, p.dau, r.wau,
           p.dau * 10000 // r.wau AS stickiness_bp
    FROM per_day p JOIN rolled r USING (day)
    ORDER BY day
    """,
)
def events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DAU / trailing-7-day WAU / stickiness per day
    (operators.timeseries.rolling_distinct): the sliding-window
    COUNT(DISTINCT) no window frame can express — distinct does not
    decompose over a moving frame. The plan reduces the raw stream to
    DISTINCT (day, user) pairs FIRST, fans the REDUCED set out ×7
    array-locally to the window ends it feeds, and runs one grouped exact
    distinct per window end — raw events are scanned once, never
    range-self-joined. Early days report partial windows (standard rolling
    convention); stickiness is integral-DIV basis points. The oracle
    replays reduction, fan-out, trim, and ratio exactly."""
    events = _t(spark, sf_dir, "events")
    from payroll_etl_fastapi_spark.operators.timeseries import rolling_distinct

    out = rolling_distinct(events, "user_id", "ts", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        "stickiness_bp",
    ).orderBy("day")


def _rolling_hll_oracle() -> str:
    from payroll_etl_fastapi_spark.operators import sketch as SK

    num = 2.0 * SK.hll_alpha_m2()
    est = f"""floor({num!r} / CAST(
                   sum(CAST(1 AS BIGINT) << ({SK.HLL_WBITS + 1} - rho))
                   + ({SK.HLL_M} - count(*)) * {1 << (SK.HLL_WBITS + 1)}
                   AS DOUBLE) * 1000000 + 0.5) / 1000000"""
    return f"""
    WITH h AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
                    1, 7)) AS BIGINT) AS hv
        FROM events
    ),
    b AS (
        SELECT day, hv % {SK.HLL_M} AS bucket,
               CASE WHEN (hv // {SK.HLL_M}) = 0 THEN {SK.HLL_WBITS + 1}
                    ELSE {SK.HLL_WBITS + 1} - length(bin(hv // {SK.HLL_M}))
               END AS rho
        FROM h
    ),
    reg AS (SELECT day, bucket, max(rho) AS rho FROM b GROUP BY day, bucket),
    dau AS (SELECT day, {est} AS dau_est FROM reg GROUP BY day),
    bound AS (SELECT max(day) AS max_day FROM reg),
    expanded AS (
        SELECT day + CAST(i AS INTEGER) AS wday, bucket, rho
        FROM reg, range(0, 7) AS r(i), bound
        WHERE day + CAST(i AS INTEGER) <= max_day
    ),
    wreg AS (
        SELECT wday AS day, bucket, max(rho) AS rho
        FROM expanded GROUP BY wday, bucket
    ),
    wau AS (SELECT day, {est} AS wau_est FROM wreg GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau_est, w.wau_est
    FROM dau d JOIN wau w USING (day)
    ORDER BY day
    """


@query("events_rolling_hll", oracle=_rolling_hll_oracle())
def events_rolling_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate rolling DAU/WAU via mergeable HLL registers
    (operators.timeseries.rolling_hll_distinct) — the 100 TB twin of
    events_rolling_distinct: per-day register sets (≤ 256 rows/day,
    whatever the cardinality) fan out ×7 instead of the distinct-entity
    set, and the trailing window merges by bucket-wise max (lossless HLL
    merge, pinned equal to single-pass window registers by pytest). The
    oracle replays hash, registers, fan-out, merge, and the raw estimator
    bit-for-bit — one IEEE division per estimate, micro-snapped."""
    events = _t(spark, sf_dir, "events")
    from payroll_etl_fastapi_spark.operators.timeseries import rolling_hll_distinct

    out = rolling_hll_distinct(events, "user_id", "ts", window_days=7)
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "dau_est", "wau_est"
    ).orderBy("day")


@query(
    "events_journey_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id AS u,
               event_type AS t1,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS ngram,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT u) AS BIGINT) AS n_users
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, ngram
    LIMIT 20
    """,
)
def events_journey_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent three-step user journeys
    (operators.funnel.journey_ngrams): fixed-length sequential pattern
    mining — the order-sensitive step up from the bigram transition
    matrix. One user-partitioned window for the two leads (bounded
    per-user state, event_id tiebreak), one grouped count with map-side
    combine (key space ≤ |types|³), TakeOrderedAndProject for the cut;
    the total (count desc, ngram) order makes the top-20 deterministic so
    the oracle replays it exactly."""
    from payroll_etl_fastapi_spark.operators import funnel as FN

    events = _t(spark, sf_dir, "events")
    return FN.journey_ngrams(events, n=3, top_k=20)


@query(
    "events_range_frame_totals",
    oracle="""
    WITH t AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               epoch_us(ts) AS us
        FROM events
    ),
    w AS (
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
               CAST(count(*) OVER win AS BIGINT)  AS n_trailing,
               CAST(sum(cents) OVER win AS BIGINT) AS cents_trailing
        FROM t
        WINDOW win AS (
            PARTITION BY user_id ORDER BY us
            RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_id, user_id, ts_s, n_trailing, cents_trailing
    FROM w
    ORDER BY cents_trailing DESC, event_id
    LIMIT 20
    """,
)
def events_range_frame_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EVENT trailing-one-hour per-user totals through a time-RANGE
    window frame — the per-row rolling aggregate neither tumbling nor
    sliding windows express (those bucket time; this anchors an exact
    trailing hour at every event). Top-20 events by trailing cents.

    The frame is RANGE over epoch MICROSECONDS (integer on both engines:
    unix_micros here, epoch_us in the oracle), so peer rows — same user,
    same microsecond — enter the frame together and the result is
    independent of any within-timestamp tiebreak, which is what makes the
    frame hash-replayable. Scale shape: ONE user-partitioned window
    (bounded per-user state, the sliding-window state Spark spills by
    key), cents sums exact integers, top-20 is TakeOrderedAndProject."""
    events = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    t = events.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        cents.alias("cents"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-(3600 * 1_000_000 - 1), Window.currentRow)
    )
    return (
        t.select(
            "event_id",
            "user_id",
            "ts_s",
            F.count(F.lit(1)).over(win).cast("long").alias("n_trailing"),
            F.sum("cents").over(win).cast("long").alias("cents_trailing"),
        )
        .orderBy(F.desc("cents_trailing"), "event_id")
        .limit(20)
    )


@query(
    "events_interval_merge",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS start_us,
               epoch_us(ts)
                 + (1 + ((CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT)
                          % 30) + 30) % 30) * 60000000 AS end_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, start_us, end_us,
               CASE WHEN max(end_us) OVER prev IS NULL
                         OR start_us > max(end_us) OVER prev
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
        WINDOW prev AS (
            PARTITION BY user_id ORDER BY start_us, end_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        )
    ),
    islands AS (
        SELECT user_id, start_us, end_us,
               CAST(sum(new_island) OVER (
                   PARTITION BY user_id ORDER BY start_us, end_us, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS island
        FROM flagged
    )
    SELECT user_id, island,
           min(start_us)                 AS start_us,
           max(end_us)                   AS end_us,
           count(*)                      AS n_events,
           max(end_us) - min(start_us)   AS span_us
    FROM islands
    GROUP BY user_id, island
    ORDER BY user_id, island
    """,
)
def events_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union merge (operators.timeseries.merge_intervals): each
    event opens a DURATION interval — 1..30 minutes derived deterministically
    from its value cents — and overlapping/touching per-user intervals fuse
    into maximal islands. This is the extent-overlap primitive gap-based
    sessionization cannot express: a long interval swallows later short ones
    that start before it ENDS, regardless of inter-event gaps.

    Determinism: all arithmetic in integer epoch-micros; the duration is
    (1 + cents mod 30) minutes with a sign-safe mod spelled identically in
    both engines; ordering carries event_id. Scale shape: one shuffle on
    user_id serves the cummax window, the island numbering, AND the final
    per-island aggregate."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + F.lit(0.5)).cast(
        "long"
    )
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (
            F.unix_micros(F.col("ts"))
            + (1 + F.pmod(cents, F.lit(30))) * F.lit(60_000_000)
        ).alias("end_us"),
    )
    from payroll_etl_fastapi_spark.operators.timeseries import merge_intervals

    merged = merge_intervals(iv, "user_id", "start_us", "end_us", "event_id")
    return merged.select(
        "user_id",
        "island",
        F.col("start").alias("start_us"),
        F.col("end").alias("end_us"),
        F.col("n_intervals").alias("n_events"),
        (F.col("end") - F.col("start")).alias("span_us"),
    ).orderBy("user_id", "island")


@query(
    "events_ewma_hourly",
    oracle="""
    WITH hourly AS (
        SELECT user_id,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               extract(hour FROM ts) AS h,
               CAST(sum(CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS c
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT user_id, day,
           count(*) AS n_obs,
           list_reduce(list(c ORDER BY h), (acc, x) -> (acc + x) // 2)
               AS ewma_cents
    FROM hourly
    GROUP BY user_id, day
    ORDER BY user_id, day
    """,
)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) exponential smoothing of hourly spend
    (operators.timeseries.ewma_fold): the inherently SEQUENTIAL per-key
    recurrence s_t = (s_{t-1} + v_t) DIV 2 that no window frame or
    associative aggregate expresses — run as an array-local integer fold
    over each key's ≤ 24 hourly buckets, after one grouped cents sum.

    Determinism: non-negative integer cents, α = 1/2 ⇒ every intermediate
    is an exact integer; the oracle re-runs the identical fold with
    DuckDB's list_reduce over the hour-ordered list. Scale shape: bucket
    FIRST (per-key state = bucket count, never event volume), fold inside
    codegen, no Python, no window."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(
        F.abs(F.coalesce(F.col("value"), F.lit(0.0))) * 100 + F.lit(0.5)
    ).cast("long")
    hourly = (
        e.select(
            "user_id",
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
                "day"
            ),
            F.hour("ts").alias("h"),
            cents.alias("v"),
        )
        .groupBy("user_id", "day", "h")
        .agg(F.sum("v").alias("c"))
    )
    from payroll_etl_fastapi_spark.operators.timeseries import ewma_fold

    out = ewma_fold(hourly, ["user_id", "day"], "h", "c")
    return out.select(
        "user_id", "day", "n_obs", F.col("ewma").alias("ewma_cents")
    ).orderBy("user_id", "day")


@query(
    "events_decayed_popularity",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT)
                   AS cents
        FROM events
    ),
    b AS (SELECT max(day) AS max_day FROM d)
    SELECT event_type,
           CAST(sum(cents >> least(date_diff('day', day, max_day), 40))
                AS BIGINT)                 AS decayed_cents,
           CAST(sum(cents) AS BIGINT)      AS raw_cents,
           count(*)                        AS n_events
    FROM d, b
    GROUP BY event_type
    ORDER BY decayed_cents DESC, event_type
    """,
)
def events_decayed_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed popularity scoring with a one-day half-life — the
    trending/recency ranker — made EXACT and order-independent by integer
    arithmetic: 2^-age decay is a RIGHT SHIFT of integer cents by the age
    in days (capped at 40, past which the contribution is zero anyway), so
    per-row contributions are integers and the grouped sum commutes.
    Float pow() decay would be aggregation-order-sensitive; shifts aren't.

    Scale shape: one scan, a broadcast one-row max-day bound, one grouped
    sum with map-side combine — the decayed score costs exactly what the
    raw rollup costs, and both ride the same aggregate."""
    e = _t(spark, sf_dir, "events")
    cents = F.floor(
        F.abs(F.coalesce(F.col("value"), F.lit(0.0))) * 100 + F.lit(0.5)
    ).cast("long")
    d = e.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        cents.alias("cents"),
    )
    b = d.agg(F.max("day").alias("max_day"))
    return (
        d.crossJoin(F.broadcast(b))
        .select(
            "event_type",
            F.expr(
                "shiftright(cents, least(datediff(max_day, day), 40))"
            ).alias("dec"),
            "cents",
        )
        .groupBy("event_type")
        .agg(
            F.sum("dec").alias("decayed_cents"),
            F.sum("cents").alias("raw_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("decayed_cents"), "event_type")
    )


@query(
    "window_function_breadth",
    oracle="""
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               o_orderdate AS d,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
        WHERE o_custkey % 7 = 0
    )
    SELECT o_orderkey, o_custkey, day,
           CAST(row_number() OVER seq AS BIGINT)                 AS seq,
           CAST(coalesce(date_diff('day', lag(d) OVER seq, d), -1)
                AS BIGINT)                                       AS gap_prev_days,
           CAST(coalesce(date_diff('day', d, lead(d) OVER seq), -1)
                AS BIGINT)                                       AS gap_next_days,
           CAST(ntile(4) OVER seq AS BIGINT)                     AS quartile,
           CAST(dense_rank() OVER (
               PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
           ) AS BIGINT)                                          AS price_rank,
           first_value(o_orderkey) OVER frame                    AS first_key,
           last_value(o_orderkey) OVER frame                     AS last_key,
           coalesce(nth_value(o_orderkey, 2) OVER frame, -1)     AS second_key,
           CAST(floor(percent_rank() OVER seq * 10000 + 0.5)
                AS BIGINT)                                       AS pr_bp
    FROM o
    WINDOW seq AS (PARTITION BY o_custkey ORDER BY d, o_orderkey),
           frame AS (PARTITION BY o_custkey ORDER BY d, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, seq
    """,
)
def window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full analytic-window surface in one gate: row_number, lag/lead
    day gaps, ntile quartiles, dense_rank under a second ordering,
    first/last/nth_value over the explicit full-partition ROWS frame, and
    percent_rank snapped to integral basis points — every function ordered
    by a unique (date, orderkey) tiebreak so each value is a pure function
    of the data. Complements the single-purpose window gates (running
    totals, range frames, per-group top-k) by pinning the REST of the
    catalog cross-engine.

    Scale shape: ONE hash exchange on o_custkey serves all three window
    specs (same partition key; Catalyst chains the two sort orders), and
    the filter on customer bucket is pushed to the scan."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 7 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.col("o_orderdate").alias("d"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    seq = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    frame = seq.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price = Window.partitionBy("o_custkey").orderBy(
        F.col("cents").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            "day",
            F.row_number().over(seq).cast("long").alias("seq"),
            F.coalesce(
                F.datediff(F.col("d"), F.lag("d").over(seq)), F.lit(-1)
            )
            .cast("long")
            .alias("gap_prev_days"),
            F.coalesce(
                F.datediff(F.lead("d").over(seq), F.col("d")), F.lit(-1)
            )
            .cast("long")
            .alias("gap_next_days"),
            F.ntile(4).over(seq).cast("long").alias("quartile"),
            F.dense_rank().over(price).cast("long").alias("price_rank"),
            F.first("o_orderkey").over(frame).alias("first_key"),
            F.last("o_orderkey").over(frame).alias("last_key"),
            F.coalesce(
                F.nth_value("o_orderkey", 2).over(frame), F.lit(-1)
            ).alias("second_key"),
            F.floor(F.percent_rank().over(seq) * 10000 + F.lit(0.5))
            .cast("long")
            .alias("pr_bp"),
        )
        .orderBy("o_custkey", "seq")
    )


# ---------------------------------------------------------------------------
# classical seasonal decomposition (round 9) — the timeseries family's
# trend/seasonal/remainder split
# ---------------------------------------------------------------------------


@query(
    "events_seasonal_decompose",
    oracle="""
    WITH b AS (
        SELECT event_type AS key,
               CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS t,
               count(*) AS y
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT key, min(t) AS lo, max(t) AS hi FROM b GROUP BY 1),
    grid AS (SELECT key, unnest(generate_series(lo, hi)) AS t FROM span),
    s AS (
        SELECT g.key, g.t, coalesce(b.y, 0) AS y
        FROM grid g LEFT JOIN b USING (key, t)
    ),
    tw AS (
        SELECT key, t, y,
               CASE WHEN count(*) OVER w1 = 24 AND count(*) OVER w2 = 24
                    THEN sum(y) OVER w1 + sum(y) OVER w2 END AS trend_q
        FROM s
        WINDOW w1 AS (PARTITION BY key ORDER BY t
                      ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING),
               w2 AS (PARTITION BY key ORDER BY t
                      ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)
    ),
    d AS (
        SELECT *,
               CASE WHEN trend_q IS NOT NULL THEN 48 * y - trend_q END AS detr_q,
               t % 24 AS phase
        FROM tw
    ),
    raw AS (
        SELECT key, phase, CAST(sum(detr_q) // count(*) AS BIGINT) AS raw_q
        FROM d WHERE detr_q IS NOT NULL GROUP BY 1, 2
    ),
    adj AS (SELECT key, CAST(sum(raw_q) // 24 AS BIGINT) AS adj_q FROM raw GROUP BY 1),
    sea AS (
        SELECT r.key, r.phase, r.raw_q - a.adj_q AS seasonal_q
        FROM raw r JOIN adj a USING (key)
    )
    SELECT d.key AS event_type, d.t, CAST(d.y AS BIGINT) AS y,
           CAST(d.trend_q AS BIGINT) AS trend_q,
           CAST(coalesce(sea.seasonal_q, 0) AS BIGINT) AS seasonal_q,
           CAST(d.detr_q - coalesce(sea.seasonal_q, 0) AS BIGINT) AS remainder_q
    FROM d LEFT JOIN sea USING (key, phase)
    ORDER BY event_type, t
    """,
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (operators.timeseries.
    seasonal_decompose) — the trend/seasonal/remainder split (statsmodels
    seasonal_decompose; the moving-average method STL refines) over each
    event type's dense hourly count series at period 24. Integer-exact in
    q-units (denominator 2x24): the trend is the two staggered 24-window
    sums added (the 2xP centered MA numerator), per-phase seasonal means
    and the centering adjustment use integral division (Spark `div` ==
    DuckDB `//` on negatives — verified), and edge rows with incomplete
    windows carry NULL trend/remainder, the classical behavior. The
    oracle replays grid densification, both staggered windows, the phase
    rollup, centering, and every remainder cell. ONE exchange on the key
    feeds both window sums and the phase rollup."""
    from payroll_etl_fastapi_spark.operators import timeseries as TS

    events = _t(spark, sf_dir, "events")
    b = (
        events.select(
            F.col("event_type").alias("key"),
            (F.expr("unix_timestamp(date_trunc('hour', ts)) div 3600")).alias(
                "t"
            ),
        )
        .groupBy("key", "t")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    span = b.groupBy("key").agg(F.min("t").alias("lo"), F.max("t").alias("hi"))
    grid = span.select(
        "key", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("t")
    )
    dense = grid.join(b, ["key", "t"], "left").select(
        "key", "t", F.coalesce(F.col("y"), F.lit(0)).alias("y")
    )
    out = TS.seasonal_decompose(dense, "key", "t", "y", period=24)
    return out.select(
        F.col("key").alias("event_type"),
        "t",
        F.col("y").cast("long").alias("y"),
        F.col("trend_q").cast("long").alias("trend_q"),
        F.col("seasonal_q").cast("long").alias("seasonal_q"),
        F.col("remainder_q").cast("long").alias("remainder_q"),
    ).orderBy("event_type", "t")
