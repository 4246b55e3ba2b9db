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


# ---------------------------------------------------------------------------
# round 8: bigram LM (the conditional step — text_bigram_lm gate's operator)
# ---------------------------------------------------------------------------


def test_bigram_lm_scores_exact_tiny(spark):
    # corpus bigrams: doc1 'a b a b' -> (a,b) x2, (b,a) x1; doc2 'a b'
    # -> (a,b); totals c12(a,b)=3, c12(b,a)=1; contexts c1(a)=3, c1(b)=1;
    # vocab V=2 (a, b); add-one smoothing
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo"), (4, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in T.bigram_lm_scores(docs).collect()}
    V = 3  # a, b, solo
    p_ab = (3 + 1) / (3 + V)
    p_ba = (1 + 1) / (1 + V)
    want1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    want2 = -math.log(p_ab)
    assert out[1].n_bigrams == 3
    assert abs(out[1].avg_neg_log_prob - want1) < 1e-12
    assert out[2].n_bigrams == 1
    assert abs(out[2].avg_neg_log_prob - want2) < 1e-12
    # single-token and empty docs have no bigrams -> no row
    assert 3 not in out and 4 not in out


def test_bigram_lm_flags_word_salad_unigram_cannot(spark):
    """The functional claim: a scrambled doc whose TOKEN multiset equals an
    in-order doc (identical unigram score by construction) scores strictly
    higher under the bigram model — its transitions are unseen."""
    prose = "the quick brown fox jumps over the lazy dog"
    salad = "dog the over quick lazy fox the jumps brown"  # same multiset
    rows = [(i, prose) for i in range(20)] + [(100, prose), (101, salad)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uni = {r.id: r.avg_neg_log_prob for r in T.unigram_lm_scores(docs).collect()}
    assert abs(uni[100] - uni[101]) < 1e-12
    big = {r.id: r.avg_neg_log_prob for r in T.bigram_lm_scores(docs).collect()}
    assert big[101] > big[100] + 1.0
