"""Unit tests for operators/cdc.py: ordered CDC application (deletes,
resurrection, same-seq ties), SCD2 version chains, and partial-state merge.
The gate queries (plans/suite_cdc.py) prove oracle parity; these pin the
edge semantics on crafted frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.cdc import (
    cdc_apply,
    merge_agg_states,
    scd2_apply,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestCdcApply:
    def test_last_writer_wins_with_deletes(self, spark):
        snap = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k int, v string"
        )
        feed = spark.createDataFrame(
            [
                (1, "x1", "D", 1),   # delete...
                (1, "x2", "U", 2),   # ...then resurrect: survives as x2
                (2, "y1", "U", 1),   # update...
                (2, "y2", "D", 2),   # ...then delete: gone
                (4, "d", "U", 1),    # brand-new key: inserted
            ],
            "k int, v string, op string, seq int",
        )
        out = cdc_apply(snap, feed, keys=["k"])
        assert _rows(out, "k", "v") == [(1, "x2"), (3, "c"), (4, "d")]

    def test_same_seq_tie_prefers_delete(self, spark):
        snap = spark.createDataFrame([(1, "a")], "k int, v string")
        feed = spark.createDataFrame(
            [(1, "u", "U", 5), (1, "d", "D", 5)],
            "k int, v string, op string, seq int",
        )
        out = cdc_apply(snap, feed, keys=["k"])
        assert out.count() == 0  # the delete outranks the same-seq upsert

    def test_untouched_keys_pass_through(self, spark):
        snap = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        feed = spark.createDataFrame(
            [(2, "b2", "U", 1)], "k int, v string, op string, seq int"
        )
        assert _rows(cdc_apply(snap, feed, ["k"]), "k", "v") == [(1, "a"), (2, "b2")]

    def test_schema_mismatch_raises(self, spark):
        snap = spark.createDataFrame([(1, "a")], "k int, v string")
        feed = spark.createDataFrame(
            [(1, "U", 1)], "k int, op string, seq int"  # missing payload col v
        )
        with pytest.raises(ValueError, match="must match snapshot"):
            cdc_apply(snap, feed, ["k"])


class TestScd2Apply:
    def test_version_chain(self, spark):
        dim = spark.createDataFrame(
            [(1, "s0", 0), (2, "t0", 0)], "k int, attr string, seq int"
        )
        changes = spark.createDataFrame(
            [(1, "s1", 1), (1, "s2", 2)], "k int, attr string, seq int"
        )
        out = scd2_apply(dim, changes, keys=["k"])
        got = sorted(
            (r.k, r.attr, r.valid_from_seq, r.valid_to_seq, r.is_current)
            for r in out.collect()
        )
        assert got == [
            (1, "s0", 0, 1, False),
            (1, "s1", 1, 2, False),
            (1, "s2", 2, None, True),
            (2, "t0", 0, None, True),  # unchanged key: one open version
        ]

    def test_exactly_one_current_per_key(self, spark):
        dim = spark.createDataFrame(
            [(k, f"v{k}", 0) for k in range(20)], "k int, attr string, seq int"
        )
        changes = spark.createDataFrame(
            [(k, f"w{k}", 1) for k in range(0, 20, 3)], "k int, attr string, seq int"
        )
        out = scd2_apply(dim, changes, keys=["k"])
        per_key = (
            out.groupBy("k")
            .agg(F.sum(F.col("is_current").cast("int")).alias("n_cur"))
            .collect()
        )
        assert all(r.n_cur == 1 for r in per_key)


class TestMergeAggStates:
    def test_merge_equals_full_recompute(self, spark):
        df = spark.range(1000).select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("x"),
        )
        halves = [df.filter(F.col("x") < 500), df.filter(F.col("x") >= 500)]
        states = [
            h.groupBy("g").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("x").alias("sx"),
                F.min("x").alias("mn"),
                F.max("x").alias("mx"),
            )
            for h in halves
        ]
        merged = merge_agg_states(
            states, ["g"], {"n": "sum", "sx": "sum", "mn": "min", "mx": "max"}
        )
        direct = df.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        assert _rows(merged, "g", "n", "sx", "mn", "mx") == _rows(
            direct, "g", "n", "sx", "mn", "mx"
        )

    def test_non_mergeable_fn_rejected(self, spark):
        st = spark.createDataFrame([(1, 2.0)], "g int, m double")
        with pytest.raises(ValueError, match="non-mergeable"):
            merge_agg_states([st], ["g"], {"m": "avg"})


def test_cdc_apply_same_seq_upsert_payload_tiebreak_deterministic(spark):
    """Two 'U' rows with identical (key, seq) but different payloads must pick
    the same winner on every run: the orderBy falls back to the payload
    columns, so the survivor is the payload-sorted first row, not whichever
    row the shuffle delivered first."""
    snap = spark.createDataFrame([(1, "old")], "k int, v string")
    feed = spark.createDataFrame(
        [(1, "b", "U", 5), (1, "a", "U", 5)], "k int, v string, op string, seq int"
    )
    outs = {
        tuple(sorted((r.k, r.v) for r in cdc_apply(snap, feed, ["k"]).collect()))
        for _ in range(3)
    }
    assert outs == {((1, "a"),)}


def test_cdc_apply_tolerates_non_orderable_payload_types(spark):
    """A map payload column must not join the tiebreak sort (MapType is not
    orderable) — the feed still applies; only same-(key,seq,op) ties among
    map payloads stay engine-ordered."""
    snap = spark.createDataFrame([(1, {"a": "old"})], "k int, props map<string,string>")
    feed = spark.createDataFrame(
        [(1, {"a": "new"}, "U", 5), (2, {"b": "x"}, "U", 1)],
        "k int, props map<string,string>, op string, seq int",
    )
    got = {r.k: dict(r.props) for r in cdc_apply(snap, feed, ["k"]).collect()}
    assert got == {1: {"a": "new"}, 2: {"b": "x"}}
