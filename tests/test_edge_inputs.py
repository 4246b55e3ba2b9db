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


def test_cdc_neardup_on_empty_and_identical_payloads(spark):
    from payroll_etl_fastapi_spark.operators import multimodal as MM

    empty_media = spark.createDataFrame([], MM.MEDIA_SCHEMA)
    assert MM.cdc_chunk_digests(empty_media).count() == 0
    assert (
        MM.cdc_neardup_pairs(MM.cdc_chunk_digests(empty_media)).count() == 0
    )
    # 4 byte-identical payloads: every pair is an exact dup (jaccard 10000)
    # ... unless the df cap removes the shared digests; max_df must count
    # DOCS, so cap 4 keeps them and cap 3 yields no pairs at all
    rows = [
        (i, "image", bytearray(b"same-bytes-here " * 40), (None, None, None, None))
        for i in range(1, 5)
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    digests = MM.cdc_chunk_digests(media)
    pairs = MM.cdc_neardup_pairs(digests, max_df=4).collect()
    assert len(pairs) == 6 and all(r.jaccard_bp == 10000 for r in pairs)
    assert MM.cdc_neardup_pairs(digests, max_df=3).count() == 0


def test_bfs_hops_empty_edges_and_unknown_sources(spark):
    from payroll_etl_fastapi_spark.operators import graph as G

    edges = spark.createDataFrame([], "src long, dst long")
    sources = spark.createDataFrame([(7,)], ["node"])
    got = G.bfs_hops(edges, sources, max_hops=2).collect()
    # sources themselves always appear at dist 0, even with no edges
    assert [(r.node, r.dist) for r in got] == [(7, 0)]
    # a source absent from the graph reaches nothing else
    pairs = spark.createDataFrame([(1, 2)], ["u", "v"])
    got2 = {
        r.node: r.dist
        for r in G.bfs_hops(G.symmetric_edges(pairs), sources, max_hops=2).collect()
    }
    assert got2 == {7: 0}


def test_rolling_hll_single_day(spark):
    import datetime as dt

    from payroll_etl_fastapi_spark.operators.timeseries import rolling_hll_distinct

    ev = spark.createDataFrame(
        [(dt.datetime(2025, 1, 1, 9), f"u{i}") for i in range(700)],
        "ts timestamp, user_id string",
    )
    rows = rolling_hll_distinct(ev, "user_id", "ts").collect()
    assert len(rows) == 1
    # one day: the trailing window IS the day, estimates must coincide
    assert rows[0].dau_est == rows[0].wau_est


# ---------------------------------------------------------------------------
# round 8 (second session): the new operator families on degenerate input
# ---------------------------------------------------------------------------


def test_r8_text_ops_on_empty_and_degenerate_docs(spark, empty_docs):
    from payroll_etl_fastapi_spark.operators import corpus as C

    assert T.bigram_lm_scores(empty_docs).count() == 0
    assert dedup.remove_duplicate_spans(empty_docs).count() == 0
    assert C.chunk_documents(empty_docs).count() == 0
    assert T.compression_ratio_stats(empty_docs).count() == 0

    docs = spark.createDataFrame(
        [(1, ""), (2, " \t "), (3, "solo"), (4, "a b")], DOCS_SCHEMA
    )
    # bigram LM: only the 2-token doc emits a row
    assert {r.id for r in T.bigram_lm_scores(docs).collect()} == {4}
    # span removal: every doc appears; empty/whitespace normalize to ''
    out = {r.id: r.text_clean for r in dedup.remove_duplicate_spans(docs).collect()}
    assert out == {1: "", 2: "", 3: "solo", 4: "a b"}
    # chunking: empty docs vanish, tiny docs are one whole-doc chunk
    ch = {r.id: r.chunk_text for r in C.chunk_documents(docs).collect()}
    assert ch == {3: "solo", 4: "a b"}
    # compression: empty rows report zeros, unflagged
    cr = {r.id: (r.n_bytes, r.flagged) for r in T.compression_ratio_stats(docs).collect()}
    assert cr[1] == (0, False) and cr[2][0] == 3  # whitespace IS bytes


def test_r8_shuffle_shards_single_row_and_empty(spark, empty_docs):
    from payroll_etl_fastapi_spark.operators import corpus as C

    assert C.shuffle_shards(empty_docs, 4).count() == 0
    one = spark.createDataFrame([(42, "x")], DOCS_SCHEMA)
    rows = C.shuffle_shards(one, 4, seed=3).collect()
    assert len(rows) == 1 and rows[0].pos == 0 and 0 <= rows[0].shard < 4


def test_r8_ann_ops_on_single_vector_corpus(spark):
    from payroll_etl_fastapi_spark.operators import pq as PQ
    from payroll_etl_fastapi_spark.operators import similarity as s2

    one = spark.createDataFrame([(0, [1.0, 2.0, 3.0, 4.0])], EMB_SCHEMA)
    bounds = PQ.sq8_train_bounds(one, 4)
    # every dimension degenerate (span 0) -> codes 0, search vs self empty
    packed = PQ.sq8_encode_packed(one, bounds)
    assert PQ.sq8_topk(packed, one, bounds, 3).count() == 0  # self excluded
    # refine over an empty shortlist yields nothing
    empty_short = spark.createDataFrame(
        [], "query_id long, neighbor_id long"
    )
    assert s2.refine_topk(one, empty_short, one, 3).count() == 0


def test_r8_semantic_contamination_empty_bench(spark):
    from payroll_etl_fastapi_spark.operators import similarity as s2

    corpus = spark.createDataFrame([(0, [1.0] * 8), (1, [0.5] * 8)], EMB_SCHEMA)
    bench = spark.createDataFrame(
        [], "bench_id long, embedding array<float>"
    )
    assert s2.semantic_contamination(corpus, bench, 0.8, dim=8).count() == 0


def test_r8_incremental_span_dedup_empty_batch(spark, tmp_path, empty_docs):
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    idx = TxTable(spark, str(tmp_path / "e_idx"))
    dec = dedup.incremental_span_dedup(idx, empty_docs)
    assert dec.count() == 0
    # the empty append still committed a version; a following real batch works
    real = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(8)))], DOCS_SCHEMA
    )
    dec2 = {r.id: r.accepted for r in dedup.incremental_span_dedup(idx, real).collect()}
    assert dec2 == {1: True}
