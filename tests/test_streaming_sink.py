"""File-sink test: stream → watermarked rollup → parquet with checkpoint;
restart with the same checkpoint must not duplicate output (exactly-once)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.streaming import events as SE

from tests.conftest import SF_SMALL


def test_parquet_sink_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = SE.read_events_stream(spark, SF_SMALL, max_files_per_trigger=10)
        SE.write_stream_parquet(SE.hourly_rollup(stream), out, ckpt)

    run()
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0
    assert set(first.columns) == {"window_start", "event_type", "n_events", "total_value"}

    # same checkpoint, no new input → a re-run appends nothing
    run()
    assert spark.read.parquet(out).count() == n1

    # emitted (finalized) windows carry correct counts vs the batch equivalent
    from payroll_etl_fastapi_spark.sources.registry import load_table

    batch = (
        load_table(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    b = {(r.window_start, r.event_type): r.n_events for r in batch.collect()}
    for r in first.collect():
        assert b[(r.window_start, r.event_type)] == r.n_events
