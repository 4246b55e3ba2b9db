"""Unit tests for operators/text.py on hand-computed fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import text as T


def _one(spark, s: str, col):
    return spark.createDataFrame([(s,)], "text string").select(col.alias("v")).first().v


def test_tokens_normalizes_and_handles_empty(spark):
    assert _one(spark, "  Foo\t BAR  baz ", T.tokens(F.col("text"))) == [
        "foo",
        "bar",
        "baz",
    ]
    assert _one(spark, "", T.tokens(F.col("text"))) == []


def test_predicted_language_markers(spark):
    assert _one(spark, "the cat and the dog of it", T.predicted_language(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze", T.predicted_language(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh", T.predicted_language(F.col("text"))) == "und"
    # tie between de and en → first lang in sorted order (de) wins
    assert _one(spark, "der the", T.predicted_language(F.col("text"))) == "de"


def test_quality_score_bounds_and_signal(spark):
    rich = "the quick brown foxes jumped over the lazy dogs in the warm field " * 3
    poor = "!!! ??? 123 456 789 000 111 222 333 444"
    q_rich = _one(spark, rich, T.quality_score(F.col("text")))
    q_poor = _one(spark, poor, T.quality_score(F.col("text")))
    assert 0.0 <= q_poor < q_rich <= 1.0


def test_bpe_token_count(spark):
    # "hello" → ceil(5/4)=2, "hi" → 1, "12" digit run → 1, "!" → 1
    assert _one(spark, "hello hi 12 !", T.bpe_token_count(F.col("text"))) == 5


def test_fingerprint_is_order_sensitive_and_stable(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a b c",), ("c b a",)], "text string"
    ).select(T.doc_fingerprint(F.col("text")).alias("fp"))
    fps = [r.fp for r in df.collect()]
    assert fps[0] == fps[1]          # identical docs → identical fingerprint
    assert fps[0] != fps[2]          # permutation → different fingerprint
    assert all(0 <= f < T.FP_MOD for f in fps)


def test_marker_count_counts_duplicates(spark):
    n = _one(spark, "the the the und", T.marker_count(T.tokens(F.col("text")), ["the"]))
    assert n == 3


def test_ngrams_and_max_multiplicity_edges(spark):
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # g2: [a b, b a, a b, b a] -> top mult 2
            (2, "x"),            # < n tokens -> empty grams
            (3, ""),             # empty text -> empty tokens
            (4, "z z z z"),      # g2: [z z, z z, z z] -> top mult 3
        ],
        "id int, text string",
    )
    rows = {
        r["id"]: r["m"]
        for r in df.select(
            "id", T.repetition_metrics(F.col("text")).alias("m")
        ).collect()
    }
    assert rows[1]["g2_total"] == 4 and rows[1]["g2_distinct"] == 2
    assert rows[1]["top2_count"] == 2
    assert rows[2]["g2_total"] == 0 and rows[2]["top2_count"] == 0
    assert rows[3]["g2_total"] == 0
    assert rows[4]["g2_total"] == 3 and rows[4]["g2_distinct"] == 1
    assert rows[4]["top2_count"] == 3


def test_repetition_stats_plan_is_shuffle_free_before_rollup(spark):
    """The most-common-gram multiplicity must come from the array-local scan:
    only the per-lang rollup exchange + the final orderBy range exchange —
    nothing before the aggregate, and no explode."""
    from payroll_etl_fastapi_spark.plans.suite_text import text_repetition_stats

    from conftest import SF_SMALL

    plan = text_repetition_stats(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2, plan  # rollup hash + orderBy range
    assert "Generate" not in plan, plan  # no explode anywhere


def test_pmi_collocations_matches_python_replica(spark):
    import math
    from collections import Counter
    from payroll_etl_fastapi_spark.operators.text import pmi_collocations

    texts = [
        "new york new york city hall",
        "new york is a city",
        "the city hall of new york",
        "a b a b a b a b",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = [t.split() for t in texts]
    uni = Counter(w for t in toks for w in t)
    n = sum(uni.values())
    bi = Counter((t[i], t[i + 1]) for t in toks for i in range(len(t) - 1))
    expect = {}
    for (w1, w2), c12 in bi.items():
        if c12 >= 2:
            pmi = math.log((c12 * n) / (uni[w1] * uni[w2]))
            expect[(w1, w2)] = (c12, uni[w1], uni[w2], math.floor(pmi * 1e6 + 0.5))
    got = {
        (r.w1, r.w2): (r.c12, r.c1, r.c2, r.pmi_micro)
        for r in pmi_collocations(df, min_count=2, top_k=100).collect()
    }
    assert got == expect
    # "new york" must outrank generic pairs containing "a"/"the"
    assert got[("new", "york")][3] > got[("a", "b")][3]


def test_pmi_min_count_prunes(spark):
    from payroll_etl_fastapi_spark.operators.text import pmi_collocations

    df = spark.createDataFrame(
        [(0, "x y x y"), (1, "p q")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2) for r in pmi_collocations(df, min_count=2, top_k=10).collect()}
    assert ("x", "y") in got and ("p", "q") not in got


# ---------------------------------------------------------------------------
# round 8: zlib compression-ratio quality signal (Arrow-batched exception)
# ---------------------------------------------------------------------------


def test_compression_ratio_matches_direct_zlib_and_flags_tails(spark):
    import zlib

    from payroll_etl_fastapi_spark.operators import text as T

    repetitive = "spam ham " * 300                  # compresses hard -> low bp
    prose = ("the quick brown fox jumps over the lazy dog while seventeen "
             "unusual meadows stretch toward distant hills where farmers "
             "gather ripe apples and children chase bright kites under a "
             "warm autumn sky near the old stone bridge that crosses our "
             "shallow winding river every single morning")
    import random as _random

    _rng = _random.Random(99)  # test-local; the operator itself is RNG-free
    noise = "".join(chr(_rng.randint(33, 126)) for _ in range(1200))
    docs = spark.createDataFrame(
        [(1, repetitive), (2, prose), (3, noise), (4, "")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in T.compression_ratio_stats(docs).collect()}
    for i, txt in [(1, repetitive), (2, prose), (3, noise)]:
        raw = txt.encode("utf-8")
        assert out[i].n_bytes == len(raw)
        assert out[i].z_bytes == len(zlib.compress(raw, 6))
        assert out[i].ratio_bp == (out[i].z_bytes * 10000) // out[i].n_bytes
    assert out[1].flagged and out[1].ratio_bp < 2500       # templated spam
    assert not out[2].flagged                              # natural prose
    assert out[3].ratio_bp > 8000                          # barely compresses
    assert (out[4].n_bytes, out[4].ratio_bp, out[4].flagged) == (0, 0, False)
