"""Unit tests for operators.text.unigram_lm_scores."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import text as T


def test_unigram_lm_scores_exact_tiny(spark):
    # corpus: 'a a a b' → counts a=3, b=1; N=4, V=2; add-one smoothing
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b"), (3, "  ")], "doc_id long, text string"
    )
    out = {r.id: r for r in T.unigram_lm_scores(docs).collect()}
    p_a = (3 + 1) / (4 + 2)
    p_b = (1 + 1) / (4 + 2)
    assert out[1].n_tokens == 3
    assert abs(out[1].avg_neg_log_prob - (-math.log(p_a))) < 1e-12
    assert abs(out[2].avg_neg_log_prob - (-math.log(p_b))) < 1e-12
    # rare token is more surprising than the common one
    assert out[2].avg_neg_log_prob > out[1].avg_neg_log_prob
    # whitespace-only doc has no tokens -> no row
    assert 3 not in out


def test_unigram_lm_snap_micros_close_to_raw(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 5} common common w{i}") for i in range(50)],
        "doc_id long, text string",
    )
    raw = {r.id: r.avg_neg_log_prob for r in T.unigram_lm_scores(docs).collect()}
    snap = {
        r.id: r.avg_neg_log_prob
        for r in T.unigram_lm_scores(docs, snap_micros=True).collect()
    }
    assert set(raw) == set(snap)
    for k in raw:
        assert abs(raw[k] - snap[k]) < 1e-5
