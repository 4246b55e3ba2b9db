"""Sequential funnel analysis over an event stream: per-user ordered
step completion (view → click → purchase and friends) with strict
temporal ordering — the product-analytics primitive (Amplitude/Mixpanel
funnels) a relational engine is asked for the moment it holds an events
table.

Semantics: a user completes step k at the EARLIEST event of step k's type
that is STRICTLY AFTER their step-(k-1) completion time (step 1 is the
user's earliest step-1 event). This is the standard "first qualifying
chain" funnel — re-orderings like purchase-before-view do not count.

Scale shape (100 TB events): step k is ONE equality join of the step-k
event slice against the (user, t_{k-1}) frame — both sides keyed on the
user, so a cluster reuses the user-hash exchange across all K-1 joins —
followed by ONE map-side-combined grouped min. Each step's event slice is
filter-pushed to the scan (only step-type rows are read per stage). No
window over all events, no per-user event collection (power users with
millions of events never materialize as one array), no Python.

Everything reported is integer (user counts, basis-point conversion,
millisecond lags via unix_millis, integer-divided averages), so a SQL
oracle replays the funnel exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, t1, ..., tK): completion timestamp per step for users who
    completed ALL K steps in strict temporal order; users stall out of the
    frame at their first missed step (outer counting happens in
    `funnel_counts`, which runs per-prefix)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    u, ty, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    cur = (
        events.filter(ty == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts).alias("t1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        sl = events.filter(ty == step).select(
            u.alias("user"), ts.alias("__ts")
        )
        prev_cols = [f"t{i}" for i in range(1, k)]
        cur = (
            sl.join(cur, "user")
            .filter(F.col("__ts") > F.col(f"t{k - 1}"))
            .groupBy("user")
            .agg(
                *[F.max(c).alias(c) for c in prev_cols],
                F.min("__ts").alias(f"t{k}"),
            )
        )
    return cur


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step_idx, step, n_users, conv_bp, avg_lag_ms): users reaching each
    funnel prefix, conversion vs step 1 in integer basis points, and the
    integer-divided average milliseconds from step-1 completion to step-k
    completion. One row per step, step order ascending.

    The per-prefix frames are the incremental chain's own intermediates
    (each step's frame extends the previous — K-1 joins TOTAL, not K²/2),
    reused lazily: Spark computes each stage once per consuming aggregate
    within one whole plan."""
    u, ty, ts = F.col(user_col), F.col(type_col), F.col(ts_col)
    chain = [
        events.filter(ty == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts).alias("t1"))
    ]
    for k, step in enumerate(steps[1:], start=2):
        sl = events.filter(ty == step).select(u.alias("user"), ts.alias("__ts"))
        prev_cols = [f"t{i}" for i in range(1, k)]
        chain.append(
            sl.join(chain[-1], "user")
            .filter(F.col("__ts") > F.col(f"t{k - 1}"))
            .groupBy("user")
            .agg(
                *[F.max(c).alias(c) for c in prev_cols],
                F.min("__ts").alias(f"t{k}"),
            )
        )
    n1 = chain[0].agg(F.count(F.lit(1)).alias("n1"))
    frames = []
    for k, ft in enumerate(chain, start=1):
        # cast: sources may surface TIMESTAMP_NTZ (e.g. plain parquet
        # round-trips), which unix_millis rejects; the difference is
        # identical either way
        lag = (
            F.unix_millis(F.col(f"t{k}").cast("timestamp"))
            - F.unix_millis(F.col("t1").cast("timestamp"))
            if k > 1
            else F.lit(0).cast("long")
        )
        frames.append(
            ft.agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum(lag).alias("__sum_lag"),
            ).select(
                F.lit(k).alias("step_idx"),
                F.lit(steps[k - 1]).alias("step"),
                "n_users",
                "__sum_lag",
            )
        )
    allk = frames[0]
    for f in frames[1:]:
        allk = allk.unionByName(f)
    return (
        allk.crossJoin(F.broadcast(n1))
        .select(
            "step_idx",
            "step",
            "n_users",
            F.expr("CAST(n_users * 10000 DIV n1 AS BIGINT)").alias("conv_bp"),
            F.expr(
                "CAST(CASE WHEN n_users = 0 THEN 0"
                " ELSE coalesce(__sum_lag, 0) DIV n_users END AS BIGINT)"
            ).alias("avg_lag_ms"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, offset_week, n_users, retention_bp): weekly cohort
    retention — users grouped by the Monday-truncated week of their FIRST
    event; for each later week offset, how many distinct cohort members
    were active, in integer basis points of the cohort's size.

    Scale shape (100 TB): one grouped min for first-event times; one
    user-keyed equality join back to the stream (exchange shared with the
    funnel chain's shape); one (cohort, offset) grouped distinct-count
    (two-level aggregate); the offset-0 denominators are a tiny
    (#cohorts)-row frame broadcast back. Integer week arithmetic
    (datediff DIV 7), so a SQL oracle replays cohorts, offsets, and
    retention exactly."""
    u, ts = F.col(user_col), F.col(ts_col)
    firsts = events.groupBy(u.alias("user")).agg(F.min(ts).alias("t0"))
    act = (
        events.select(u.alias("user"), ts.alias("__ts"))
        .join(firsts, "user")
        .select(
            "user",
            F.date_format(F.date_trunc("week", F.col("t0")), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            F.expr("CAST(datediff(to_date(__ts), to_date(t0)) DIV 7 AS INT)").alias(
                "offset_week"
            ),
        )
    )
    counts = act.groupBy("cohort_week", "offset_week").agg(
        F.countDistinct("user").cast("long").alias("n_users")
    )
    base = counts.filter(F.col("offset_week") == 0).select(
        "cohort_week", F.col("n_users").alias("n0")
    )
    return (
        counts.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "offset_week",
            "n_users",
            F.expr("CAST(n_users * 10000 DIV n0 AS BIGINT)").alias(
                "retention_bp"
            ),
        )
        .orderBy("cohort_week", "offset_week")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(from_type, to_type, n, row_bp): the first-order Markov transition
    matrix of consecutive event types within each user's timeline — the
    journey-analysis complement to the funnel (which asks about ONE chosen
    path; this surfaces ALL observed next-step distributions). row_bp is
    the row-normalized transition share in integer basis points.

    Scale shape (100 TB): ONE window partitioned by user (bounded by a
    single user's activity — never a global sort) computes each event's
    successor; ONE grouped count (at most |types|² output rows) plus a
    broadcast row-total attach. The explicit ``tiebreak_col`` makes the
    ordering total, so the matrix is deterministic and SQL-replayable even
    with equal timestamps."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("CAST(n * 10000 DIV row_total AS BIGINT)").alias("row_bp"),
        )
        .orderBy("from_type", "to_type")
    )


def journey_ngrams(
    events: DataFrame,
    n: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(ngram, n_occurrences, n_users): the ``top_k`` most frequent length-n
    event-type sequences across user timelines — sequential pattern mining
    at fixed length, the order-sensitive step up from the transition
    matrix's bigrams (a '>'-joined trigram distinguishes view>click>buy
    from click>view>buy, which pair counts cannot).

    Scale shape (100 TB): ONE window partitioned by user computes the n-1
    leads (state bounded by a single user's activity), the n-gram string is
    a pure projection, and the count is one grouped aggregate with map-side
    combine whose key space is at most |types|^n; top_k is
    TakeOrderedAndProject. Total (count desc, ngram) order makes the cut
    deterministic and SQL-replayable."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    parts = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    grams = (
        events.select(
            F.col(user_col).alias("u"),
            F.concat_ws(">", *parts).alias("ngram"),
            parts[-1].isNotNull().alias("full"),
        )
        .filter(F.col("full"))
    )
    return (
        grams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("u").cast("long").alias("n_users"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(top_k)
    )
