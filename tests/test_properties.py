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
