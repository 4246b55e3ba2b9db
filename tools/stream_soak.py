#!/usr/bin/env python
"""Sustained-volume streaming soak (VERDICT r5 #5).

The streaming gates drain availableNow micro-batches over a handful of
files — they pin correctness, not sustained-rate behavior. This harness
feeds the SAME two stateful paths the gates pin — the watermarked
stream-stream interval join (purchase attribution) and the CDC MERGE into
a TxTable — through ≥``--chunks`` (default 50) micro-batches of real
events data in timestamp order, and records per-batch latency, input rows,
and state-store rows. What it demonstrates:

- STATE PLATEAUS under watermark eviction: the join holds ~1 h of views
  per side, so once the watermark starts moving, state-store rows flatten
  instead of tracking total rows ingested (pytest pins this at small scale,
  tests/test_stream_soak.py).
- THROUGHPUT vs trigger sizing: the join path runs at maxFilesPerTrigger
  1 and 4; per-batch latency has a fixed micro-batch floor, so 4-file
  triggers should approach 4× the rows/sec of 1-file triggers.

Chunking: events are sorted by ts and written as one parquet file per
chunk with strictly increasing mtimes — the file stream source orders its
initial listing by modification time, so the availableNow drain replays
the chunks as an in-order stream of ``chunks`` micro-batches, exactly how
a production tail of landing files arrives.

Usage: python tools/stream_soak.py [sf_dir] [--chunks N] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CHUNK_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def write_chunks(spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int) -> int:
    """Split events into `n_chunks` single-file parquet chunks in ts order
    (driver-side pyarrow write — the soak's one deliberate driver
    materialization; chunking is harness setup, not the system under test)."""
    from payroll_etl_fastapi_spark.sources.registry import load_table

    pdf = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts")
        .toPandas()
    )
    os.makedirs(out_dir, exist_ok=True)
    n = len(pdf)
    per = max(1, n // n_chunks)
    now = time.time()
    for i in range(n_chunks):
        lo = i * per
        hi = n if i == n_chunks - 1 else (i + 1) * per
        if lo >= n:
            break
        path = os.path.join(out_dir, f"chunk_{i:04d}.parquet")
        # micros, not pandas' default nanos: the stream schema pins
        # TimestampType and Spark reads TIMESTAMP(NANOS) only as raw int64
        pdf.iloc[lo:hi].to_parquet(
            path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(path, (now + i, now + i))  # strictly increasing mtimes
    return n


def read_chunk_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int
) -> DataFrame:
    return (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def _progress_rows(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        state = p.get("stateOperators") or []
        out.append(
            {
                "batch_id": p.get("batchId"),
                "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
                "input_rows": p.get("numInputRows"),
                "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
            }
        )
    return out


def soak_stream_join(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> dict:
    """The streaming_stream_join gate's graph at sustained volume: purchases
    ⋈ views within 1 h, both sides watermarked 1 h."""
    stream = read_chunk_stream(spark, src_dir, max_files_per_trigger)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
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
    name = f"soak_join_mft{max_files_per_trigger}_{int(time.monotonic() * 1e6)}"
    t0 = time.perf_counter()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = _progress_rows(q)
    rows_in = sum(b["input_rows"] or 0 for b in batches)
    out_rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    return {
        "path": "stream_join",
        "max_files_per_trigger": max_files_per_trigger,
        "wall_seconds": round(wall, 2),
        "n_batches": len(batches),
        "input_rows": rows_in,
        "output_rows": out_rows,
        "rows_per_sec": round(rows_in / wall, 1) if wall else None,
        "batches": batches,
    }


def soak_cdc_merge(spark: SparkSession, src_dir: str, scratch: str) -> dict:
    """The streaming_cdc_txtable gate's graph at sustained volume: every
    micro-batch MERGEs into a TxTable (update matched / insert unmatched),
    epoch-guarded for exactly-once."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable, merge_stream_txtable

    table = TxTable(spark, os.path.join(scratch, "cdc_target"))
    batch = spark.read.schema(CHUNK_SCHEMA).parquet(src_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    # initial snapshot = even event_ids (the gate's shape): every micro-batch
    # then mixes updates (evens) and inserts (odds)
    table.overwrite(
        batch.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", cents)
    )
    stream = read_chunk_stream(spark, src_dir, 1).select("event_id", "user_id", cents)
    t0 = time.perf_counter()
    q = merge_stream_txtable(
        stream,
        table,
        checkpoint=os.path.join(scratch, "ckpt_cdc"),
        keys=["event_id"],
    )
    wall = time.perf_counter() - t0
    batches = _progress_rows(q)
    rows_in = sum(b["input_rows"] or 0 for b in batches)
    return {
        "path": "cdc_merge",
        "wall_seconds": round(wall, 2),
        "n_batches": len(batches),
        "input_rows": rows_in,
        "final_table_rows": table.snapshot().count(),
        "n_versions": table.latest_version(),
        "rows_per_sec": round(rows_in / wall, 1) if wall else None,
        "batches": batches,
    }


def plateau_stats(batches: list[dict]) -> dict:
    """State-growth summary over the batch sequence: peak, final, and the
    ratio of the last-third max to the middle-third max (≈1 ⇒ plateau,
    ≫1 ⇒ state tracks total ingest — a leak)."""
    rows = [b["state_rows"] for b in batches if b["state_rows"] is not None]
    if len(rows) < 9:
        return {"n": len(rows)}
    third = len(rows) // 3
    mid_max = max(rows[third : 2 * third])
    last_max = max(rows[2 * third :])
    return {
        "n": len(rows),
        "peak": max(rows),
        "final": rows[-1],
        "mid_third_max": mid_max,
        "last_third_max": last_max,
        "last_over_mid": round(last_max / mid_max, 3) if mid_max else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--chunks", type=int, default=50)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from payroll_etl_fastapi_spark.session import get_spark

    spark = get_spark("stream-soak")
    scratch = tempfile.mkdtemp(prefix="stream_soak_")
    try:
        src = os.path.join(scratch, "chunks")
        n = write_chunks(spark, args.sf_dir, src, args.chunks)
        print(f"soak: {n} events in {args.chunks} chunks", file=sys.stderr)
        results = []
        for mft in (1, 4):
            r = soak_stream_join(spark, src, mft)
            r["state"] = plateau_stats(r["batches"])
            results.append(r)
            print(
                f"soak: stream_join mft={mft}: {r['n_batches']} batches, "
                f"{r['rows_per_sec']} rows/s, state {r['state']}",
                file=sys.stderr,
            )
        r = soak_cdc_merge(spark, src, scratch)
        results.append(r)
        print(
            f"soak: cdc_merge: {r['n_batches']} batches, {r['rows_per_sec']} rows/s, "
            f"{r['n_versions']} versions, {r['final_table_rows']} rows",
            file=sys.stderr,
        )
        payload = {"sf_dir": args.sf_dir, "chunks": args.chunks, "paths": results}
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(payload, fh, indent=1)
        # keep the stdout line compact (batches live in --json if requested)
        for r in results:
            r.pop("batches", None)
        print(json.dumps(payload))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
