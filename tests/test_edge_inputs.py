"""Edge-input robustness: empty corpora, single rows, and degenerate
documents must flow through every operator family without errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StringType, StructField, StructType

from payroll_etl_fastapi_spark.operators import dedup, similarity as sim, text as T

DOCS_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)
EMB_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
)


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], DOCS_SCHEMA)


def test_dedup_family_on_empty_corpus(spark, empty_docs):
    assert dedup.exact_duplicates(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_lsh_pairs(empty_docs).count() == 0
    assert dedup.simhash_pairs(empty_docs).count() == 0


def test_dedup_family_on_degenerate_docs(spark):
    # empty string, whitespace-only, below-shingle-size, one normal pair
    docs = spark.createDataFrame(
        [(1, ""), (2, "   \t "), (3, "one two"), (4, "a b c d e f"), (5, "a b c d e f")],
        DOCS_SCHEMA,
    )
    exact = dedup.exact_duplicates(docs).collect()
    # "" and whitespace-only normalize identically → one dup group; 4/5 another
    reps = {r.representative: r.n_dups for r in exact}
    assert reps == {1: 2, 4: 2}
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in jac} == {(4, 5)}  # short docs yield no shingles
    assert dedup.minhash_lsh_pairs(docs).count() >= 1


def test_similarity_on_empty_and_zero_vectors(spark):
    empty = spark.createDataFrame([], EMB_SCHEMA)
    assert sim.cosine_topk(empty, empty, k=3).count() == 0
    zero = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])], EMB_SCHEMA
    )
    rows = sim.cosine_topk(zero, zero.filter(F.col("vec_id") == 2), k=5).collect()
    # zero vector → null cosine (nullif guard), still ranked (nulls last), no NaN
    assert [r.neighbor_id for r in rows] == [1]
    assert rows[0].cosine is None


def test_text_operators_on_degenerate_docs(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "7 !!")], DOCS_SCHEMA)
    out = df.select(
        T.predicted_language(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("q"),
        T.bpe_token_count(F.col("text")).alias("bpe"),
        T.doc_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert [r.lang for r in out] == ["und", "und", "und"]
    assert all(0.0 <= r.q <= 1.0 for r in out)
    assert out[0].fp == 0 and out[1].fp == 0  # no tokens → identity fold
    assert out[2].bpe == 3  # digit run + two punct marks
