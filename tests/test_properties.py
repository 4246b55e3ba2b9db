"""Property-based tests (hypothesis): Spark operators vs pure-Python models
on randomized inputs. Each example ships a whole batch of strings/rows into
one DataFrame action, so examples stay cheap enough for a JVM roundtrip."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.operators.upsert import insert_if_absent, upsert

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abc XY9 .!\t\né中")), max_size=60
    ),
    min_size=1,
    max_size=12,
)


def _py_norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.lower()).strip()


def _py_tokens(s: str) -> list[str]:
    n = _py_norm(s)
    return n.split(" ") if n else []


def _py_fingerprint(s: str) -> int:
    h = 0
    for tok in _py_tokens(s):
        th = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:7], 16)
        h = (h * T.FP_BASE + th) % T.FP_MOD
    return h


def _run_batch(spark, strings, col):
    df = spark.createDataFrame([(s,) for s in strings], "text string")
    return [r.v for r in df.select(col.alias("v")).collect()]


@given(texts)
@settings(**SETTINGS)
def test_tokens_match_python_model(spark, batch):
    got = _run_batch(spark, batch, T.tokens(F.col("text")))
    assert got == [_py_tokens(s) for s in batch]


@given(texts)
@settings(**SETTINGS)
def test_fingerprint_matches_python_model(spark, batch):
    got = _run_batch(spark, batch, T.doc_fingerprint(F.col("text")))
    assert got == [_py_fingerprint(s) for s in batch]


@given(texts)
@settings(**SETTINGS)
def test_quality_score_bounded(spark, batch):
    got = _run_batch(spark, batch, T.quality_score(F.col("text")))
    assert all(0.0 <= q <= 1.0 and math.isfinite(q) for q in got)


rows = st.lists(
    st.tuples(st.integers(0, 8), st.integers(-100, 100)), min_size=1, max_size=20
)


@given(rows, rows)
@settings(**SETTINGS)
def test_upsert_properties(spark, base_rows, update_rows):
    base = spark.createDataFrame(base_rows, "k int, v int").dropDuplicates(["k"])
    updates = spark.createDataFrame(update_rows, "k int, v int").dropDuplicates(["k"])
    merged = upsert(base, updates, ["k"])
    got = {r.k: r.v for r in merged.collect()}
    expect = {**{r.k: r.v for r in base.collect()}, **{r.k: r.v for r in updates.collect()}}
    assert got == expect  # update wins, union of keys, one row per key

    # idempotence: applying the same updates again changes nothing
    again = {r.k: r.v for r in upsert(merged, updates, ["k"]).collect()}
    assert again == got


@given(rows, rows)
@settings(**SETTINGS)
def test_insert_if_absent_properties(spark, base_rows, incoming_rows):
    base = spark.createDataFrame(base_rows, "k int, v int").dropDuplicates(["k"])
    incoming = spark.createDataFrame(incoming_rows, "k int, v int").dropDuplicates(["k"])
    merged = insert_if_absent(base, incoming, ["k"])
    got = {r.k: r.v for r in merged.collect()}
    expect = {**{r.k: r.v for r in incoming.collect()}, **{r.k: r.v for r in base.collect()}}
    assert got == expect  # existing wins, new keys appended


cdc_rows = st.lists(
    st.tuples(
        st.integers(0, 5),                      # key
        st.integers(0, 4),                      # seq
        st.sampled_from(["U", "D"]),            # op
        st.integers(-50, 50),                   # payload
    ),
    min_size=0,
    max_size=16,
)


@given(rows, cdc_rows)
@settings(**SETTINGS)
def test_cdc_apply_matches_python_model(spark, snap_rows, feed_rows):
    from payroll_etl_fastapi_spark.operators.cdc import cdc_apply

    snap = spark.createDataFrame(snap_rows, "k int, v int").dropDuplicates(["k"])
    feed = spark.createDataFrame(feed_rows, "k int, v int, op string, seq int")
    got = sorted((r.k, r.v) for r in cdc_apply(snap, feed, ["k"]).collect())

    # model: per key, winner = max seq, D beats U at equal seq, then the
    # smallest payload (the deterministic payload tiebreak)
    win: dict[int, tuple] = {}
    for k, v, op, seq in feed_rows:
        cur = win.get(k)
        # higher seq wins; tie → D beats U; tie → smaller payload wins
        key = (seq, -(0 if op == "D" else 1), -v)
        if cur is None or key > cur[0]:
            win[k] = (key, op, v)
    state = {r.k: r.v for r in snap.collect()}
    for k, (_, op, v) in win.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == sorted(state.items())


@given(st.lists(st.tuples(st.integers(0, 4), st.integers(-100, 100)), min_size=1, max_size=30),
       st.integers(1, 4))
@settings(**SETTINGS)
def test_merge_agg_states_equals_direct(spark, data, n_splits):
    from payroll_etl_fastapi_spark.operators.cdc import merge_agg_states

    df = spark.createDataFrame(data, "g int, x int")
    chunks = [data[i::n_splits] for i in range(n_splits)]
    states = [
        spark.createDataFrame(c or [(99, 0)], "g int, x int")
        .filter(F.lit(bool(c)))
        .groupBy("g")
        .agg(F.sum("x").alias("s"), F.min("x").alias("mn"), F.max("x").alias("mx"))
        for c in chunks
    ]
    merged = merge_agg_states(states, ["g"], {"s": "sum", "mn": "min", "mx": "max"})
    direct = df.groupBy("g").agg(
        F.sum("x").alias("s"), F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    as_map = lambda d: {r.g: (r.s, r.mn, r.mx) for r in d.collect()}  # noqa: E731
    assert as_map(merged) == as_map(direct)


@given(rows, rows)
@settings(**SETTINGS)
def test_txtable_merge_properties(spark, base_rows, src_rows):
    """MERGE == the pure-Python three-clause model: matched rows with
    target v%3==0 delete, other matched rows take the source value,
    source-only keys insert, target-only keys survive untouched — and the
    pre-merge version stays time-travel-readable."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    base = spark.createDataFrame(base_rows, "k int, v int").dropDuplicates(["k"])
    src = spark.createDataFrame(src_rows, "k int, v int").dropDuplicates(["k"])
    b = {r.k: r.v for r in base.collect()}
    s = {r.k: r.v for r in src.collect()}
    if not b:
        return  # merge requires an existing table; empty-base is append's job
    scratch = tempfile.mkdtemp(prefix="merge_prop_")
    try:
        t = TxTable(spark, scratch + "/t")
        t.overwrite(base)
        t.merge(
            src, ["k"],
            when_matched_delete=F.coalesce(F.col("v") % 3 == 0, F.lit(False)),
        )
        got = {r.k: r.v for r in t.snapshot().collect()}
        expect = {}
        for k, v in b.items():
            if k in s:
                if v is not None and v % 3 == 0:
                    continue  # matched + delete predicate on TARGET value
                expect[k] = s[k]
            else:
                expect[k] = v
        for k, v in s.items():
            if k not in b:
                expect[k] = v
        assert got == expect
        assert {r.k: r.v for r in t.snapshot(version=1).collect()} == b
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# -- round-4 post-tail operators --------------------------------------------

_small_longs = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=1, max_size=60
)


@given(_small_longs)
@settings(**SETTINGS)
def test_hdr_quantile_bounds_property(spark, vals):
    """For ANY non-negative input: n is exact, every reported quantile is a
    lower bound of some input value within the 2^-m relative bucket
    width, and p50 <= p90 <= p99."""
    from payroll_etl_fastapi_spark.operators import sketch as SK

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = SK.hdr_quantiles(SK.hdr_histogram(df, "v")).collect()[0]
    assert row.n == len(vals)
    assert row.p50 <= row.p90 <= row.p99
    m = SK.HDR_MBITS
    for name in ("p50", "p90", "p99"):
        lb = getattr(row, name)
        assert any(lb <= v <= lb + (lb >> m) + 1 for v in vals), (name, lb)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),       # user
            st.sampled_from(["a", "b", "c"]),            # type
            st.integers(min_value=0, max_value=10_000),  # second offset
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_funnel_counts_monotonic_property(spark, rows):
    """Funnel prefixes can only lose users: n_users is non-increasing in
    step index, conv_bp starts at 10000, and avg_lag_ms is non-negative."""
    import datetime as dt

    from payroll_etl_fastapi_spark.operators import funnel as FN

    df = spark.createDataFrame(
        [
            (u, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
            for u, t, s in rows
        ],
        "user_id long, event_type string, ts timestamp",
    )
    if df.filter(F.col("event_type") == "a").count() == 0:
        return
    out = FN.funnel_counts(df, ["a", "b", "c"]).collect()
    ns = [r.n_users for r in sorted(out, key=lambda r: r.step_idx)]
    assert ns == sorted(ns, reverse=True)
    assert out[0].conv_bp == 10000
    assert all(r.avg_lag_ms >= 0 for r in out)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=2,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_transition_matrix_conservation_property(spark, rows):
    """Row shares never exceed 10000 bp in total, every count is positive,
    and total transitions = total events minus one per active user."""
    import datetime as dt

    from payroll_etl_fastapi_spark.operators.funnel import transition_matrix

    df = spark.createDataFrame(
        [
            (u, i, t, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i))
            for i, (u, t) in enumerate(rows)
        ],
        "user_id long, event_id long, event_type string, ts timestamp",
    )
    out = transition_matrix(df).collect()
    per_user = {}
    for u, _ in rows:
        per_user[u] = per_user.get(u, 0) + 1
    expected_total = sum(c - 1 for c in per_user.values())
    assert sum(r.n for r in out) == expected_total
    from collections import defaultdict

    by_from = defaultdict(int)
    for r in out:
        assert r.n > 0
        by_from[r.from_type] += r.row_bp
    assert all(total <= 10000 for total in by_from.values())


# -- content-defined chunking invariants (operators/multimodal.py) ----------

_payloads = st.binary(min_size=0, max_size=3000)


def _cdc_chunks_bytes(p: bytes) -> list[bytes]:
    """Chunk BYTES (not digests) via the exact anchor rule, for invariants."""
    import numpy as np

    n = len(p)
    if n == 0:
        return []
    a = np.frombuffer(p, np.uint8)
    cut: list[int] = []
    if n >= 4:
        u = a.astype(np.uint64)
        w = (
            (u[:-3] << np.uint64(24))
            | (u[1:-2] << np.uint64(16))
            | (u[2:-1] << np.uint64(8))
            | u[3:]
        )
        anchor = ((w * np.uint64(2654435761)) % np.uint64(2**32)) >> np.uint64(26) == 0
        cut = (np.nonzero(anchor)[0] + 4).tolist()
        if cut and cut[-1] == n:
            cut = cut[:-1]
    return [bytes(q) for q in np.split(a, cut)]


@given(_payloads)
@settings(max_examples=200, deadline=None)
def test_cdc_chunks_partition_the_payload(payload):
    """Chunks must concatenate back to the payload, each non-empty — the
    fingerprint covers every byte exactly once (no gap/overlap bug can
    hide: any off-by-one in the split indices breaks reconstruction)."""
    chunks = _cdc_chunks_bytes(payload)
    assert b"".join(chunks) == payload
    assert all(len(c) > 0 for c in chunks)


@given(_payloads, st.binary(min_size=1, max_size=16))
@settings(max_examples=100, deadline=None)
def test_cdc_suffix_append_preserves_interior_chunks(payload, suffix):
    """Appending bytes may only affect the LAST chunk's neighborhood: all
    chunks strictly before the old final chunk survive verbatim — the
    locality property that makes the digest set shift-robust."""
    before = _cdc_chunks_bytes(payload)
    after = _cdc_chunks_bytes(payload + suffix)
    if len(before) <= 1:
        return  # nothing interior to preserve
    interior = before[:-1]
    assert after[: len(interior)] == interior


# ---------------------------------------------------------------------------
# Epoch-history fuzz (round 11): exactly-once under randomized interleavings
# of stream epochs, batch DML, compaction (with and without retirement),
# and vacuum — the scenario tests in test_txtable.py pin the two known
# ADVICE r10 loss paths; this drives arbitrary sequences through the same
# machinery and asserts the wiped-checkpoint re-drain never double-admits.
# ---------------------------------------------------------------------------

_EPOCH_OPS = st.lists(
    st.sampled_from(["append", "update", "delete", "optimize", "retire", "vacuum"]),
    max_size=5,
)


@given(ops=_EPOCH_OPS, n_epochs=st.integers(min_value=2, max_value=4))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_epoch_history_exactly_once_fuzz(spark, tmp_path_factory, ops, n_epochs):
    """Drain n epochs (simulating the sink's epoch guard + the engine's
    commit log), apply an arbitrary op sequence, wipe the checkpoint, and
    re-drain: every stream row lands exactly once, batch-append rows are
    untouched, and deletes stay deleted (no vacuumed manifest ever
    resurrects a replay)."""
    import os
    import shutil

    from payroll_etl_fastapi_spark.sources.txtable import (
        TxTable,
        _stream_append_commit,
        _table_epoch_versions,
    )

    root = str(tmp_path_factory.mktemp("epoch_fuzz"))
    table = TxTable(spark, os.path.join(root, "t"))
    ckpt = os.path.join(root, "ck")

    def drain():
        # write_stream_txtable's _apply semantics without the streaming
        # engine: epoch guard via the full history, then the commit-log
        # marker the engine writes after foreachBatch returns
        os.makedirs(os.path.join(ckpt, "commits"), exist_ok=True)
        hist = _table_epoch_versions(table) if table.exists() else None
        for e in range(n_epochs):
            key = f"{os.path.abspath(ckpt)}#{e}"
            if hist is None or key not in hist:
                df = spark.range(e * 10, e * 10 + 5).selectExpr("id")
                v = _stream_append_commit(table, df, key)
                if hist is not None:
                    hist.add(key, v)
            with open(os.path.join(ckpt, "commits", str(e)), "w") as fh:
                fh.write("{}")

    drain()
    n_batch = 0
    for i, op in enumerate(ops):
        if op == "append":
            table.append(spark.range(1000 + i * 10, 1000 + i * 10 + 3).selectExpr("id"))
            n_batch += 3
        elif op == "update":
            table.update(F.col("id") < 0, {"id": F.lit(-1)})
        elif op == "delete":
            table.delete(F.col("id") < 0)
        elif op == "optimize":
            table.optimize(target_bytes=1 << 30)
        elif op == "retire":
            table.optimize(target_bytes=1 << 30, retire_checkpoints=[ckpt])
        elif op == "vacuum":
            table.vacuum(keep_last=1, min_orphan_age_seconds=0)
    shutil.rmtree(ckpt)
    drain()

    rows = [r.id for r in table.snapshot().collect()]
    stream_rows = sorted(r for r in rows if r < 1000)
    expect = sorted(x for e in range(n_epochs) for x in range(e * 10, e * 10 + 5))
    assert stream_rows == expect  # exactly once, nothing lost, nothing doubled
    assert sum(1 for r in rows if r >= 1000) == n_batch
