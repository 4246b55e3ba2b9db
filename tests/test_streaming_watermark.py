"""Watermark semantics of the streaming rollups, pinned empirically:

- a late event whose window state is STILL LIVE merges into it (the watermark
  is a lower-bound guarantee about dropping, not a promise to drop early);
- once the watermark has passed a window and its state was evicted, a later
  event for that window is dropped — append mode emits every window exactly
  once, never a duplicate;
- the late-event filter lags one batch behind the displayed watermark (the
  filter uses the watermark committed by the PREVIOUS batch).
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.streaming import events as SE

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write(path: str, rows: list[tuple]) -> None:
    # single FILE parquet (like the driver's testdata) — the streaming file
    # source lists plain files, not Spark-written parquet directories
    pd.DataFrame(rows, columns=COLS).to_parquet(path)
    time.sleep(1.1)  # file source orders batches by modification time


def _ns(hh: int, mm: int) -> int:
    return (1704067200 + hh * 3600 + mm * 60) * 1_000_000_000  # 2024-01-01 UTC


def test_watermark_eviction_and_late_drop(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    _write(os.path.join(src, "e1.parquet"), [(1, _ns(0, 10), 1, "a", 1.0, "{}"),
                                             (2, _ns(0, 20), 1, "a", 1.0, "{}")])
    _write(os.path.join(src, "e2.parquet"), [(3, _ns(3, 0), 1, "a", 1.0, "{}")])
    # batch 2: watermark (03:00 - 1h) has passed the 00:00 window, but its
    # state is still live this batch → the 00:30 straggler MERGES
    _write(os.path.join(src, "e3.parquet"), [(4, _ns(0, 30), 1, "a", 1.0, "{}"),
                                             (5, _ns(6, 0), 1, "a", 1.0, "{}")])
    # batch 3: 00:00 state was evicted at the end of batch 2 → the 00:40
    # straggler is DROPPED by the watermark filter
    _write(os.path.join(src, "e4.parquet"), [(6, _ns(0, 40), 1, "a", 1.0, "{}"),
                                             (7, _ns(9, 0), 1, "a", 1.0, "{}")])

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(SE.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    SE.run_available_now(SE.hourly_rollup(raw, watermark="1 hour"), "t_wm", "append")
    out = spark.table("t_wm").collect()

    by_window: dict[str, int] = {}
    for r in out:
        key = str(r.window_start)
        assert key not in by_window, "append mode must emit each window exactly once"
        by_window[key] = r.n_events

    # live-state merge: the 00:30 straggler made it in; the 00:40 one did not
    assert by_window["2024-01-01 00:00:00"] == 3
    # windows whose state is still open at shutdown are not emitted
    assert "2024-01-01 09:00:00" not in by_window
    # the 03:00 and 06:00 windows were finalized by later watermark advances
    assert by_window.get("2024-01-01 03:00:00") == 1
    assert by_window.get("2024-01-01 06:00:00") == 1


def test_stream_stream_join_state_bounded_by_watermark(spark, tmp_path):
    """The purchase-attribution self-join keeps view state only inside the
    watermark horizon: a purchase arriving after the global watermark passed
    its (late) event time is dropped, so the evicted view never re-pairs —
    join state is bounded to ~1h of views per user, not stream history."""
    src = str(tmp_path / "ss")
    os.makedirs(src)
    # batch 1: two views at 00:00 / 00:10
    _write(os.path.join(src, "a.parquet"), [
        (1, _ns(0, 0), 1, "view", 1.0, "{}"),
        (2, _ns(0, 10), 2, "view", 1.0, "{}"),
    ])
    # batch 2: matching purchase at 00:30 (inside V1's hour) + a 05:00
    # view AND purchase to advance BOTH sides' watermarks to 04:00
    # (the global watermark is the min across watermark operators)
    _write(os.path.join(src, "b.parquet"), [
        (3, _ns(0, 30), 1, "purchase", 9.0, "{}"),
        (4, _ns(5, 0), 99, "view", 1.0, "{}"),
        (5, _ns(5, 0), 98, "purchase", 2.0, "{}"),
    ])
    # batch 3: a purchase at 00:50 for user 2 — late behind the 04:00
    # watermark, but V2's state is only EVICTED at the end of this batch
    # (state removal, like the late filter, lags one batch): it still pairs
    _write(os.path.join(src, "c.parquet"), [
        (6, _ns(0, 50), 2, "purchase", 7.0, "{}"),
    ])
    # batch 4: same-shape late purchase ONE BATCH LATER — V2 is gone now;
    # this one must never pair (the bounded-state guarantee under test)
    _write(os.path.join(src, "d.parquet"), [
        (7, _ns(0, 55), 2, "purchase", 7.0, "{}"),
    ])

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(SE.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    purchases = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    views = (
        raw.filter(F.col("event_type") == "view")
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
    SE.run_available_now(joined, "t_ssj_wm", "append")
    pairs = sorted(
        (r.purchase_id, r.view_id) for r in spark.table("t_ssj_wm").collect()
    )
    # (3,1): in-horizon match. (6,2): late row in the SAME batch the
    # watermark crossed — state eviction is a lower-bound guarantee, one
    # batch behind, so it still joins. (7,2): absent — V2's state is gone.
    assert pairs == [(3, 1), (6, 2)]
