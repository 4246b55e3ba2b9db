"""Sustained-volume streaming soak (VERDICT r5 #5): ≥25 micro-batches of
ts-ordered events through the two stateful production paths, pinning that

- stream-stream join state PLATEAUS under watermark eviction (state rows
  track the 1 h join horizon, not total rows ingested),
- the CDC MERGE path applies every micro-batch exactly once (one epoch-
  guarded version per batch, final table = full upserted keyspace).

The full-scale run (50 chunks at sf0.1, plus throughput-vs-trigger-size)
is tools/stream_soak.py; results recorded in PLANS.md.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def soak(spark, tmp_path_factory):
    import stream_soak as SS

    base = tmp_path_factory.mktemp("soak")
    src = str(base / "chunks")
    n = SS.write_chunks(spark, SF_SMALL, src, n_chunks=30)
    assert n >= 500
    return SS, src, str(base)


def test_stream_join_state_plateaus_over_30_batches(spark, soak):
    SS, src, _ = soak
    r = SS.soak_stream_join(spark, src, max_files_per_trigger=1)
    stats = SS.plateau_stats(r["batches"])
    assert r["n_batches"] >= 25
    assert r["input_rows"] >= 1000  # both sides of the self-join read the files
    # plateau: the last third's state high-water is within 1.5× of the middle
    # third's — a leak (state ∝ total ingest) would show ≈3× here
    assert stats["last_over_mid"] is not None and stats["last_over_mid"] <= 1.5
    # eviction actually happens: the final watermark pass shrinks state well
    # below the peak
    assert stats["final"] < stats["peak"]


def test_cdc_merge_applies_every_batch_exactly_once(spark, soak):
    SS, src, scratch = soak
    r = SS.soak_cdc_merge(spark, src, scratch)
    events = spark.read.schema(SS.CHUNK_SCHEMA).parquet(src)
    n_keys = events.select("event_id").distinct().count()
    assert r["final_table_rows"] == n_keys
    # one initial overwrite + one epoch-guarded MERGE version per micro-batch
    assert r["n_versions"] == r["n_batches"] + 1
    assert r["n_batches"] >= 25
