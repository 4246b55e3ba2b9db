"""Streaming queries in the driver gate: the Structured Streaming hourly
rollup drained with an availableNow trigger must produce exactly the batch
answer — so it shares the batch twin's DuckDB oracle (same cents-exact sums,
same formatted window keys).

This is the strongest statement the gate can make about the streaming path:
not just "runs and row counts look right", but hash-identical to a SQL
oracle that never saw a stream."""

from __future__ import annotations

import itertools
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.plans.suite import _cents, _sql_cents, _sql_msum, query
from payroll_etl_fastapi_spark.streaming import events as SE

_counter = itertools.count()

SESSION_GAP_US = 30 * 60 * 1_000_000


@contextmanager
def _stream_state_parts(spark: SparkSession, n: int = 8):
    """Scope a streaming DRAIN to ``n`` shuffle/state-store partitions
    (round 10, the filesink setup lever): a stateful query materializes one
    state-store instance PER shuffle partition PER micro-batch — provider
    init, delta file, commit — so at gate-scale state (a few thousand
    sessions/windows) the session default of 32 spends ~90% of the drain on
    empty-partition scaffolding (measured: hourly filesink 6.1 → 1.5 s at
    8). This is partition SIZING, not a semantics knob — results are
    byte-identical — and it is per-QUERY: the count is fixed into each
    fresh checkpoint at query start, and the conf is restored on exit so
    batch plans keep the session default. At production state sizes you
    raise n until per-partition state fits memory, exactly like any shuffle."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@query(
    "streaming_hourly_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           count(*)             AS n_events,
           {_sql_msum('value')} AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events_hourly_rollup frame computed INCREMENTALLY: file stream →
    watermarked tumbling windows → complete-mode memory sink, fully drained.
    Oracle-identical to the batch twin because the cents sums are exact
    integers regardless of micro-batch boundaries."""
    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    filtered = stream.filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    )
    rolled = (
        filtered.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("cents"),
        )
    )
    name = f"t_gate_hourly_{next(_counter)}"  # unique per invocation
    with _stream_state_parts(spark):
        SE.run_available_now(rolled, name, "complete")
    return (
        spark.table(name)
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "streaming_hourly_filesink",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           count(*)             AS n_events,
           {_sql_msum('value')} AS total_value
    FROM events, mx
    WHERE date_trunc('hour', ts) + INTERVAL 2 HOUR <= mx.m
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def streaming_hourly_filesink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION streaming shape, gated end-to-end: watermarked tumbling
    windows in APPEND mode through the checkpointed exactly-once parquet file
    sink (streaming/events.py write_stream_parquet, partitioned by event_type),
    then the files read back. Append emits a window exactly once, when the
    watermark passes its end — so the emitted set is every window with
    end ≤ max(ts) − 1h watermark delay (window end = start + 1h ⇒
    start + 2h ≤ max ts), which is precisely what the oracle replays. Windows
    still open at drain time are withheld — that is the semantics under test,
    not an artifact (cf. tests/test_streaming_watermark.py)."""
    import os
    import tempfile

    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    rolled = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "cents",
        )
    )
    import shutil

    base = tempfile.mkdtemp(prefix="gate_filesink_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    try:
        with _stream_state_parts(spark):
            SE.write_stream_parquet(rolled, out, ckpt, partition_by="event_type")
        # eager local checkpoint pins the read-back rows in executor storage
        # so the sink + checkpoint dirs can be deleted NOW — repeated bench /
        # gate runs previously accumulated one full rolled-up copy per run
        # (ADVICE r2); the context cleaner frees the checkpoint when the
        # returned frame is unreferenced
        readback = spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        readback.select(
            F.date_format(F.col("window_start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "streaming_session_filesink",
    oracle=f"""
    WITH mx AS (SELECT epoch_us(max(ts)) AS m FROM events),
    e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               {_sql_cents('value')} AS cents
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us, cents,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
        SELECT user_id, us, cents,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM flagged
    ),
    agg AS (
        SELECT user_id,
               min(us)                    AS start_us,
               max(us) + {SESSION_GAP_US} AS end_us,
               count(*)                   AS n_events,
               sum(cents)                 AS cents
        FROM sessions
        GROUP BY user_id, session_idx
    )
    SELECT user_id,
           strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           n_events,
           cents / 100.0 AS total_value
    FROM agg, mx
    WHERE end_us + {60 * 60 * 1_000_000} <= mx.m
    ORDER BY user_id, session_start
    """,
)
def streaming_session_filesink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in the PRODUCTION streaming shape: APPEND mode
    through the checkpointed exactly-once parquet file sink, then the files
    read back. Unlike streaming_session_rollup (complete-mode memory drain),
    append emits a session exactly once — when the watermark passes its END
    (end = last event + 30 min gap; final watermark = max ts − 1 h delay),
    so the emitted set is every session with end ≤ max(ts) − 1h, which is
    precisely what the oracle replays (same ≤ rule the hourly filesink gate
    pins). Sessions still open or within the watermark horizon at drain
    time are withheld — the semantics under test, not an artifact."""
    import os
    import shutil
    import tempfile

    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    rolled = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("cents"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "cents",
        )
    )
    base = tempfile.mkdtemp(prefix="gate_sess_filesink_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    try:
        with _stream_state_parts(spark):
            SE.write_stream_parquet(rolled, out, ckpt)
        # eager local checkpoint pins the rows so sink + checkpoint dirs can
        # be deleted now (no per-run disk accumulation — cf. hourly gate)
        readback = spark.read.parquet(out).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return (
        readback.select(
            "user_id",
            F.date_format(
                F.col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_start"),
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "streaming_dedup",
    oracle=f"""
    SELECT event_type,
           count(*)                 AS n_events,
           count(DISTINCT user_id)  AS n_users,
           {_sql_msum('value')}     AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup under duplicate delivery: the events stream is unioned
    with a 20% duplicate wave (event_id%5==0) and a 4% triplicate wave
    (event_id%25==0) — three file-stream sources over the same data, the
    at-least-once delivery shape — then deduplicated by
    streaming/events.dedup_events (watermarked dropDuplicates) and drained in
    append mode. The gate rolls the drained rows up by event_type; the oracle
    aggregates the ORIGINAL events table, so the hash matches only if every
    duplicate was suppressed and every original emitted exactly once.

    Scale shape: dedup state is one entry per event_id within the watermark
    horizon (evicted beyond it); the rollup here is a batch query over the
    drained sink, keeping the streaming graph single-stateful-operator."""
    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    dup_wave = stream.filter(F.col("event_id") % 5 == 0)
    tri_wave = stream.filter(F.col("event_id") % 25 == 0)
    noisy = stream.unionByName(dup_wave).unionByName(tri_wave)
    deduped = SE.dedup_events(noisy, watermark="1 hour")
    name = f"t_gate_dedup_{next(_counter)}"
    with _stream_state_parts(spark):
        SE.run_available_now(deduped, name, "append")
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
            (F.sum(_cents(F.col("value"))) / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
    )


@query(
    "streaming_stream_join",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
               {_sql_cents('value')} AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'
    ),
    j AS (
        SELECT p.user_id, p.purchase_id, v.view_id, p.cents
        FROM p JOIN v ON p.user_id = v.user_id
         AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
         AND v.view_ts <= p.purchase_ts
    )
    SELECT user_id,
           count(*)                    AS n_attributions,
           count(DISTINCT purchase_id) AS n_purchases,
           CAST(sum(cents) AS BIGINT)  AS attributed_cents
    FROM j
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join — purchase attribution: each purchase
    joins every view by the same user in the preceding hour, both sides
    incremental streams over the events source (a watermarked self-join,
    the ad-attribution shape). The time-range condition plus both
    watermarks bound the join state: a view's row is evicted once the
    watermark passes view_ts + 1h, so state holds one hour of views per
    user, not the stream's history. Drained append-mode; the rollup over
    the drained pairs is a batch query (single-stateful-operator graph).
    The oracle replays the identical interval join in batch SQL — inner
    joins emit every matching pair, so the drained set is exactly the
    batch answer.

    max_files_per_trigger is deliberately large here: the gate's oracle is
    the COMPLETE inner join, and if a future testdata generator ships
    events as many files, a multi-batch drain could evict view state
    between batches and drop cross-batch matches — correct streaming
    semantics, but not what this gate pins (the eviction semantics have
    their own test, tests/test_streaming_watermark.py)."""
    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=1000)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            _cents(F.col("value")).alias("cents"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    joined = purchases.join(
        views,
        F.expr(
            "p_user = v_user AND "
            "view_ts >= purchase_ts - INTERVAL 1 HOUR AND "
            "view_ts <= purchase_ts"
        ),
    )
    name = f"t_gate_ssjoin_{next(_counter)}"
    with _stream_state_parts(spark):
        SE.run_available_now(joined, name, "append")
    return (
        spark.table(name)
        .groupBy(F.col("p_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributions"),
            F.count_distinct(F.col("purchase_id")).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_cdc_txtable",
    oracle=f"""
    WITH src AS (
        SELECT event_id, user_id, {_sql_cents('value')} AS cents FROM events
    ),
    -- initial table = even event_ids; the stream MERGEs every event with
    -- cents+5: matched evens update (or delete when user_id%17=0),
    -- unmatched odds insert
    final AS (
        SELECT event_id, user_id, cents + 5 AS cents
        FROM src
        WHERE NOT (event_id % 2 = 0 AND user_id % 17 = 0)
    )
    SELECT count(*)                     AS n_rows,
           CAST(sum(cents) AS BIGINT)   AS sum_cents,
           count(DISTINCT user_id)      AS n_users
    FROM final
    """,
)
def streaming_cdc_txtable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply into the transactional table: an update stream
    MERGEd into a TxTable micro-batch by micro-batch
    (sources/txtable.merge_stream_txtable) — update matched, insert
    unmatched, delete matched where user_id%17=0 — with the epoch id
    riding in each merge commit's manifest for exactly-once application
    under at-least-once delivery. This is the reference's ON CONFLICT DO
    UPDATE load (/root/reference/src/etl.py:36-77) as a stream, landing on
    the ACID storage layer instead of Postgres. The gate reads the FINAL
    table state back through its manifest and aggregates; one lost update,
    double-applied batch, or resurrected deleted row flips the row."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from payroll_etl_fastapi_spark.sources.txtable import (
        TxTable,
        merge_stream_txtable,
    )

    from payroll_etl_fastapi_spark.plans.suite import _t

    initial = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 2 == 0)
        .select("event_id", "user_id", _cents(F.col("value")).alias("cents"))
    )
    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10).select(
        "event_id", "user_id", (_cents(F.col("value")) + 5).alias("cents")
    )
    base = tempfile.mkdtemp(prefix="gate_cdc_tx_")
    try:
        t = TxTable(spark, os.path.join(base, "t"))
        t.overwrite(initial)
        merge_stream_txtable(
            stream,
            t,
            os.path.join(base, "ckpt"),
            keys=["event_id"],
            when_matched_delete=F.col("user_id") % 17 == 0,
        )
        agg = t.snapshot().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.count_distinct(F.col("user_id")).alias("u"),
        ).collect()[0]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("n_rows", T.LongType()),
            T.StructField("sum_cents", T.LongType()),
            T.StructField("n_users", T.LongType()),
        ]
    )
    return spark.createDataFrame([(agg["n"], agg["s"], agg["u"])], schema)


@query(
    "streaming_session_rollup",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               {_sql_cents('value')} AS cents
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us, cents,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w >= {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sessions AS (
        SELECT user_id, us, cents,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           strftime(make_timestamp(min(us)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           count(*)            AS n_events,
           sum(cents) / 100.0  AS total_value
    FROM sessions
    GROUP BY user_id, session_idx
    ORDER BY user_id, session_start
    """,
)
def streaming_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows computed INCREMENTALLY by the streaming
    session_window operator, fully drained. The oracle replays the merge rule
    exactly: session_window intervals are [ts, last_ts + gap), so an event at
    delta >= gap starts a NEW session (note >= , vs > in the lag-based batch
    sessionization query — the two operators' boundary semantics differ by
    design and both are gated)."""
    from payroll_etl_fastapi_spark.plans.suite import _cents as cents_fn

    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    rolled = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents_fn(F.col("value"))).alias("cents"),
        )
    )
    name = f"t_gate_sessions_{next(_counter)}"
    with _stream_state_parts(spark):
        SE.run_available_now(rolled, name, "complete")
    return (
        spark.table(name)
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "streaming_sketch_cms",
    oracle="""
    WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    vocab AS (SELECT k, count(*) AS exact_cnt FROM keys GROUP BY k),
    top AS (
        SELECT k, exact_cnt FROM vocab ORDER BY exact_cnt DESC, k LIMIT 20
    ),
    rows AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
        SELECT rows.row,
               CAST(('0x' || substr(md5('cms' || CAST(rows.row AS VARCHAR)
                    || ':' || k), 1, 7)) AS BIGINT) % 1024 AS bucket
        FROM keys, rows
    ),
    sketch AS (SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY row, bucket),
    probe AS (
        SELECT top.k, top.exact_cnt, rows.row,
               CAST(('0x' || substr(md5('cms' || CAST(rows.row AS VARCHAR)
                    || ':' || top.k), 1, 7)) AS BIGINT) % 1024 AS bucket
        FROM top, rows
    )
    SELECT probe.k AS user_key,
           CAST(max(probe.exact_cnt) AS BIGINT) AS exact_cnt,
           CAST(min(coalesce(sketch.cnt, 0)) AS BIGINT) AS cms_count
    FROM probe LEFT JOIN sketch USING (row, bucket)
    GROUP BY probe.k
    ORDER BY exact_cnt DESC, user_key
    """,
)
def streaming_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitters sketch: each micro-batch is reduced to a
    count-min sketch (operators.sketch.cms_build) INSIDE the exactly-once
    TxTable sink's epoch guard (write_stream_txtable transform=), appending
    one fixed-size sketch delta per batch; the read side merges all deltas
    with one bucket-wise SUM — CMS linearity means the merged streaming
    sketch is BIT-IDENTICAL to the single-pass batch sketch, which is
    exactly what the oracle replays (it never sees a stream, a batch
    boundary, or the table). A double-applied replay, lost batch, or merge
    bug shifts bucket counts and flips the hash. The sketch stays ≤
    depth×width rows per batch regardless of stream volume — the
    streaming-state analog of the CMS contract. NEW in round 4 (registered
    past the tail-swap; locally oracle-verified, round-5 rotation
    candidate)."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from payroll_etl_fastapi_spark.operators import sketch as SK
    from payroll_etl_fastapi_spark.plans.suite import _t
    from payroll_etl_fastapi_spark.sources.txtable import (
        TxTable,
        write_stream_txtable,
    )

    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10).select(
        F.col("user_id").cast("string").alias("k")
    )
    base = tempfile.mkdtemp(prefix="gate_cms_stream_")
    try:
        t = TxTable(spark, os.path.join(base, "t"))
        write_stream_txtable(
            stream,
            t,
            os.path.join(base, "ckpt"),
            transform=lambda b: SK.cms_build(b, "k"),
        )
        merged = (
            t.snapshot().groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
        )
        events = _t(spark, sf_dir, "events").select(
            F.col("user_id").cast("string").alias("k")
        )
        top = (
            events.groupBy("k")
            .agg(F.count(F.lit(1)).alias("exact_cnt"))
            .orderBy(F.col("exact_cnt").desc(), "k")
            .limit(20)
        )
        est = SK.cms_estimate(merged, top, "k")
        rows = (
            top.join(est, "k")
            .select(
                F.col("k").alias("user_key"),
                F.col("exact_cnt"),
                F.col("cms_count"),
            )
            .orderBy(F.col("exact_cnt").desc(), "user_key")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("user_key", T.StringType()),
            T.StructField("exact_cnt", T.LongType()),
            T.StructField("cms_count", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r.user_key, r.exact_cnt, r.cms_count) for r in rows], schema
    )


def _hdr_events_oracle() -> str:
    from payroll_etl_fastapi_spark.operators import sketch as SKo

    m, lo = SKo.HDR_MBITS, 1 << SKo.HDR_MBITS
    key = (
        f"CASE WHEN v < {lo} THEN v "
        f"ELSE (length(bin(v)) - 1) * {lo} "
        f"+ ((v >> (length(bin(v)) - 1 - {m})) - {lo}) END"
    )

    def lb(k: str) -> str:
        return (
            f"CAST(CASE WHEN {k} < {lo} THEN {k} "
            f"ELSE (({k} % {lo}) + {lo}) << (({k} // {lo}) - {m}) END AS BIGINT)"
        )

    return f"""
    WITH v AS (
        SELECT event_type AS flag,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    k AS (
        SELECT flag, {key} AS key, count(*) AS cnt FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT flag, key, cnt,
               sum(cnt) OVER (PARTITION BY flag ORDER BY key) AS cum,
               sum(cnt) OVER (PARTITION BY flag) AS n
        FROM k
    ),
    q AS (
        SELECT flag, CAST(max(n) AS BIGINT) AS n,
               min(CASE WHEN cum >= (n * 1 + 1) // 2   THEN key END) AS k50,
               min(CASE WHEN cum >= (n * 9 + 9) // 10  THEN key END) AS k90,
               min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN key END) AS k99
        FROM c GROUP BY flag
    )
    SELECT flag AS event_type, n,
           {lb('k50')} AS p50,
           {lb('k90')} AS p90,
           {lb('k99')} AS p99
    FROM q ORDER BY event_type
    """


@query("streaming_sketch_hdr", oracle=_hdr_events_oracle())
def streaming_sketch_hdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quantile monitoring: each micro-batch reduced to a
    per-event-type HDR histogram (operators.sketch.hdr_histogram) INSIDE
    the exactly-once TxTable sink's epoch guard; the read side merges all
    deltas with one bucket-wise SUM and answers p50/p90/p99 — histogram
    linearity (like the CMS twin) makes the merged streaming sketch
    BIT-IDENTICAL to the single-pass batch sketch, which is all the oracle
    replays. The integer-only HDR arithmetic means even the quantile
    ANSWERS are exact replays, not tolerance checks. Each batch appends ≤
    ~1.9k rows per group whatever the stream volume. NEW in round 4
    (post-tail); round-5 rotation candidate."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from payroll_etl_fastapi_spark.operators import sketch as SK
    from payroll_etl_fastapi_spark.sources.txtable import (
        TxTable,
        write_stream_txtable,
    )

    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10).select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    base = tempfile.mkdtemp(prefix="gate_hdr_stream_")
    try:
        t = TxTable(spark, os.path.join(base, "t"))
        write_stream_txtable(
            stream,
            t,
            os.path.join(base, "ckpt"),
            transform=lambda b: SK.hdr_histogram(b, "v", ["event_type"]),
        )
        merged = (
            t.snapshot()
            .groupBy("event_type", "key")
            .agg(F.sum("cnt").alias("cnt"))
        )
        rows = (
            SK.hdr_quantiles(merged, group_cols=["event_type"])
            .orderBy("event_type")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("p50", T.LongType()),
            T.StructField("p90", T.LongType()),
            T.StructField("p99", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(r.event_type, r.n, r.p50, r.p90, r.p99) for r in rows], schema
    )


@query(
    "streaming_enrich_dim",
    oracle=f"""
    WITH dim AS (
        SELECT user_id,
               date_trunc('week', min(CAST(date_trunc('day', ts) AS DATE)))
                   AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT strftime(d.cohort_week, '%Y-%m-%d') AS cohort_week,
           e.event_type,
           count(*)               AS n_events,
           {_sql_msum('e.value')} AS total_value
    FROM events e JOIN dim d ON e.user_id = d.user_id
    GROUP BY 1, 2
    ORDER BY cohort_week, event_type
    """,
)
def streaming_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the remaining basic streaming join shape
    beside the stream-stream interval join: each micro-batch broadcast-joins
    a BATCH-computed dimension (per-user signup-week cohort, the
    user-profile table of a real pipeline) before a grouped rollup by
    (cohort_week, event_type).

    Scale shape: the static side is computed once and broadcast — the
    stream never shuffles for the join; aggregation state is bounded by
    weeks × event types (dimension-bounded, no watermark needed — this is
    the complete-mode case where state provably cannot grow with stream
    length). The oracle replays dim build, join, and cents-exact sums in
    one SQL statement — micro-batch boundaries cannot move the answer."""
    from payroll_etl_fastapi_spark.plans.suite import _t

    batch = _t(spark, sf_dir, "events")
    dim = (
        batch.groupBy("user_id")
        .agg(
            F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("first_day")
        )
        .select(
            "user_id",
            F.date_trunc("week", F.col("first_day")).cast("date").alias("cohort_week"),
        )
    )
    stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
    rolled = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("cohort_week", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("cents"),
        )
    )
    name = f"t_gate_enrich_{next(_counter)}"
    with _stream_state_parts(spark):
        SE.run_available_now(rolled, name, "complete")
    return (
        spark.table(name)
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "event_type",
            "n_events",
            (F.col("cents") / 100.0).alias("total_value"),
        )
        .orderBy("cohort_week", "event_type")
    )


@query(
    "streaming_txcatalog_dual",
    oracle=f"""
    WITH win AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
               event_type, {_sql_cents('value')} AS cents
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    ),
    raw_n AS (SELECT CAST(count(*) AS BIGINT) AS raw_rows FROM win)
    SELECT hour, event_type,
           CAST(count(*) AS BIGINT)   AS n_events,
           CAST(sum(cents) AS BIGINT) AS cents,
           raw_rows
    FROM win, raw_n
    GROUP BY hour, event_type, raw_rows
    ORDER BY hour, event_type
    """,
)
def streaming_txcatalog_dual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic MULTI-TABLE streaming commit (write_stream_txcatalog): each
    micro-batch appends the raw slice AND a mergeable hourly-rollup partial,
    then ONE catalog pointer swap pins both new versions — catalog readers
    see raw and rollup advance together or not at all, the streaming analog
    of the reference's single-transaction multi-table load
    (/root/reference/src/etl.py:15). Idempotence is two-level (epoch key in
    every table manifest AND in the catalog pointer), pinned by
    test_stream_txcatalog_dual_table_atomic_exactly_once incl. the
    crash-between-commits orphan-reuse path.

    The gate reads BOTH tables back through the pinned catalog: the rollup
    partials re-aggregate (mergeable integer sums — micro-batch boundaries
    cannot move them) and the raw count rides every row, so the driver hash
    covers raw/rollup consistency, not just one sink."""
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.sources.txtable import (
        TxCatalog,
        write_stream_txcatalog,
    )

    scratch = tempfile.mkdtemp(prefix="spark_txcat_gate_")
    try:
        cat = TxCatalog(spark, scratch + "/cat")
        stream = SE.read_events_stream(spark, sf_dir, max_files_per_trigger=10)
        windowed = stream.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
        ).select(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00")
            .alias("hour"),
            "event_type",
            _cents(F.col("value")).alias("cents"),
        )
        write_stream_txcatalog(
            windowed,
            cat,
            scratch + "/ckpt",
            {
                "raw": lambda b: b,
                "rollup": lambda b: b.groupBy("hour", "event_type").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c")
                ),
            },
        )
        raw_rows = cat.read("raw").count()
        merged = (
            cat.read("rollup")
            .groupBy("hour", "event_type")
            .agg(
                F.sum("n").cast("long").alias("n_events"),
                F.sum("c").cast("long").alias("cents"),
            )
            .withColumn("raw_rows", F.lit(raw_rows).cast("long"))
            .orderBy("hour", "event_type")
        )
        # materialize before the scratch dir disappears
        rows = merged.collect()
        return spark.createDataFrame(rows, merged.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
