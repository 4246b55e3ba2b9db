"""Unit tests for operators.dedup on tiny hand-built corpora.

Semantics locked here (suite_dedup.py re-checks them against DuckDB at scale):
- exact_duplicates groups by normalized content (case/whitespace-insensitive)
- shingles: docs shorter than n tokens yield no shingles (not a desc sequence)
- ngram_jaccard_pairs computes exact |A∩B|/|A∪B| over distinct shingles
- minhash_lsh_pairs finds the near-identical pair and never pairs disjoint docs
- simhash_pairs(chunks=4, max_distance=3) == brute-force hamming filter
  (pigeonhole guarantee)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import dedup


def corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_normalizes(spark):
    df = corpus(
        spark,
        [
            (1, "Hello  World"),
            (2, "hello world"),
            (3, " HELLO\tWORLD "),
            (4, "something else"),
        ],
    )
    out = dedup.exact_duplicates(df, "text", "doc_id").collect()
    assert len(out) == 1
    row = out[0]
    assert row.representative == 1
    assert row.n_dups == 3
    assert row.members == [1, 2, 3]


def test_shingles_short_doc_empty(spark):
    df = corpus(spark, [(1, "one two"), (2, "a b c d")])
    sh = dedup.shingles(df, "text", "doc_id", n=3).collect()
    ids = {r.id for r in sh}
    assert ids == {2}
    assert sorted(r.shingle for r in sh) == ["a b c", "b c d"]


def test_ngram_jaccard_exact_value(spark):
    # doc2 = doc1 + one extra token: 5-token vs 6-token text, 3 vs 4 shingles,
    # intersection 3, union 4 → jaccard 0.75
    df = corpus(
        spark,
        [
            (1, "a b c d e"),
            (2, "a b c d e f"),
            (3, "x y z w q"),
        ],
    )
    out = dedup.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.id_a, row.id_b) == (1, 2)
    assert row.jaccard == pytest.approx(0.75)


def test_minhash_lsh_finds_near_dup_not_disjoint(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = base + " extra1 extra2"
    other = " ".join(f"zzz{i}" for i in range(40))
    df = corpus(spark, [(1, base), (2, near), (3, other)])
    out = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", n=3, num_hashes=16, bands=4, min_est=0.5
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    est = {(r.id_a, r.id_b): r.est_jaccard for r in out}[(1, 2)]
    assert 0.5 <= est <= 1.0


def test_simhash_blocking_equals_bruteforce(spark):
    # 12 docs: 4 clusters of near-identical texts → blocked join must find
    # exactly the same pairs as an all-pairs hamming check
    rows = []
    doc_id = 0
    for c in range(4):
        base = " ".join(f"w{c}_{i}" for i in range(30))
        for v in range(3):
            text = base + (" tail%d" % v if v else "")
            rows.append((doc_id, text))
            doc_id += 1
    df = corpus(spark, rows)
    blocked = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_pairs(
            df, "text", "doc_id", max_distance=3, chunks=4
        ).collect()
    }
    sig = dedup.simhash(df, "text", "doc_id")
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert blocked == brute


def test_minhash_verified_pairs_exact_on_candidates(spark):
    """The composed LSH→exact-verify pipeline reports EXACT jaccard for every
    pair it returns, and its pairs are a subset of the full quadratic join."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h x"),   # near-dup of 1
            (3, "p q r s t u v w"),
            (4, "p q r s t u v w y"),   # near-dup of 3
            (5, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    verified = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_verified_pairs(docs, threshold=0.3).collect()
    }
    assert set(verified) <= set(full)
    for pair, j in verified.items():
        assert j == full[pair]          # exact, not the signature estimate
    assert (1, 2) in verified and (3, 4) in verified  # near-dups survive LSH


def test_connected_components_chains_stars_singletons(spark):
    # chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_minhash_verified_counts_matches_sets(spark):
    # the two verification shapes are different join plans over the same
    # exact computation — identical pairs AND identical jaccard doubles
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h x"),
            (3, "p q r s t u v w"),
            (4, "p q r s t u v w y"),
            (5, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    sets_res = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_verified_pairs(docs, threshold=0.3).collect()
    }
    counts_res = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_verified_pairs(
            docs, threshold=0.3, verify_via="counts"
        ).collect()
    }
    assert sets_res == counts_res


def test_connected_components_one_job_per_round(spark):
    # The convergence signal must ride the propagation job (changed flag +
    # lazy localCheckpoint materialized by the sum(chg) action) — the round-1
    # implementation ran an extra old-vs-new join + count per round and cost
    # 38 jobs on this input under AQE; the fused form costs 28. The bound
    # leaves slack for AQE job-splitting variance but fails if a second
    # per-round action sneaks back in.
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
        "id_a long, id_b long",
    )
    sc = spark.sparkContext
    sc.setJobGroup("cc-jobcount", "connected_components job budget")
    dedup.connected_components(pairs).count()
    sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("cc-jobcount")
    assert len(jobs) <= 32, f"connected_components ran {len(jobs)} jobs (budget 32)"


def test_connected_components_log_rounds_on_long_chains(spark):
    # 33-node path (diameter 32): plain min-propagation needs 32 rounds and
    # would blow the default 20-round cap; the pointer-jump (path halving)
    # must land it well inside — this is the O(log diameter) contract.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "id_a long, id_b long"
    )
    got = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert set(got.values()) == {1} and len(got) == 33


def test_connected_components_raises_on_non_convergence(spark):
    # a 6-node path needs 5 propagation rounds; cap at 2 must raise, not
    # silently return a split component
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iterations=2)
    # with room to converge the same input is one component
    got = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    assert set(got.values()) == {1}


def test_ngram_jaccard_candidates_matches_all_pairs(spark):
    """The candidate-restricted shape (the driver-gated 100 TB plan) must
    agree with the corpus-wide all-pairs oracle on every pair the
    candidates cover — same common/na/nb/jaccard, not just the same ids."""
    def text(i):
        # mutually-distinct 60-token docs: (i, 100+i) are the only near-dups
        # (jaccard 58/61 ≈ 0.95 — high enough that the seeded 16-hash/4-band
        # LSH finds every pair deterministically)
        return " ".join(f"w{i}_{j}" for j in range(60))

    rows = [(i, text(i)) for i in range(8)] + [
        (100 + i, text(i) + " qq ww ee") for i in range(8)
    ]
    df = corpus(spark, rows)
    all_pairs = dedup.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.0)
    sig = dedup.minhash_signatures(df, "text", "doc_id", n=3, num_hashes=16)
    cand = dedup._lsh_candidates(sig, num_hashes=16, bands=4)
    restricted = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.0, candidates=cand
    )
    key = lambda r: (r.id_a, r.id_b)
    all_by_key = {key(r): (r.common, r.na, r.nb, round(r.jaccard, 9)) for r in all_pairs.collect()}
    got = {key(r): (r.common, r.na, r.nb, round(r.jaccard, 9)) for r in restricted.collect()}
    # every candidate-verified pair exists in the all-pairs result with
    # identical accounting (candidates with zero overlap are dropped by both)
    assert got, "LSH must surface the constructed near-dup candidates"
    for k, v in got.items():
        assert all_by_key[k] == v, (k, v, all_by_key.get(k))
    # and the constructed near-dups (i, 100+i) are all found
    found = {k for k in got if k[1] - k[0] == 100}
    assert found == {(i, 100 + i) for i in range(8)}


def test_ngram_jaccard_candidates_plan_has_no_shingle_self_join(spark):
    """The gated composition must not contain a corpus-wide shingle
    self-join: every join in the candidate-restricted plan is either the
    banded-signature equality join or a candidate/size join — no join whose
    BOTH sides are full shingle frames keyed on the shingle value."""
    df = corpus(spark, [(1, "a b c d e f g"), (2, "a b c d e f g h")])
    sig = dedup.minhash_signatures(df, "text", "doc_id", n=3, num_hashes=16)
    cand = dedup._lsh_candidates(sig, num_hashes=16, bands=4)
    restricted = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, candidates=cand
    )
    plan = restricted._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        # a corpus-wide shingle self-join shows as a Join whose condition
        # equates two shingle attributes with no id restriction on the row
        assert not (
            "Join" in line and line.count("shingle") >= 2 and "id" not in line
        ), f"shingle self-join leaked into the candidate-restricted plan: {line}"


def test_duplicate_spans_accounting(spark):
    # w=2 spans; doc 1 and doc 2 share their first span exactly; doc 3 is
    # disjoint; doc 4 is too short for even one span (absent from output)
    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # spans: "a b", "c d"
            (2, "a b x y"),          # spans: "a b", "x y"
            (3, "p q r s"),          # spans: "p q", "r s"
            (4, "z"),                # no spans
        ],
        "doc_id long, text string",
    )
    from payroll_etl_fastapi_spark.operators.dedup import duplicate_span_stats

    out = {
        r.id: r
        for r in duplicate_span_stats(df, span_tokens=2, flag_bp=5000).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].n_spans == 2 and out[1].dup_spans == 1 and out[1].dup_bp == 5000
    assert out[1].flagged is True
    assert out[2].dup_spans == 1 and out[2].flagged is True
    assert out[3].dup_spans == 0 and out[3].dup_bp == 0 and out[3].flagged is False


def test_duplicate_spans_multiplicity_and_self_repeat(spark):
    # a doc repeating its own span: NOT cross-doc duplicated (distinct docs
    # = 1), but each occurrence still counts toward n_spans; once another
    # doc shares it, ALL occurrences count as duplicated
    from payroll_etl_fastapi_spark.operators.dedup import duplicate_span_stats

    solo = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    r = duplicate_span_stats(solo, span_tokens=2).collect()[0]
    assert r.n_spans == 2 and r.dup_spans == 0

    shared = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r.id: r for r in duplicate_span_stats(shared, span_tokens=2).collect()}
    assert rows[1].dup_spans == 2 and rows[1].dup_bp == 10000
    assert rows[2].dup_spans == 1


def test_duplicate_spans_plan_is_linear(spark):
    # no cartesian/nested-loop anywhere: candidate generation is a digest
    # equality join, the only joins in the plan
    from payroll_etl_fastapi_spark.operators.dedup import duplicate_span_stats

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = duplicate_span_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_filter_candidates_complete_vs_all_pairs(spark):
    """The prefix filter must find EVERY pair at or above the threshold —
    compare against the exhaustive all-pairs verify on a small corpus."""
    from payroll_etl_fastapi_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_pairs,
    )

    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),     # high overlap with 1
        (3, "a b c d q r s t"),     # medium overlap
        (4, "m n o p q r s t"),     # overlaps 3 somewhat
        (5, "z z1 z2 z3 z4 z5 z6 z7"),  # disjoint
        (6, "a b c d e f g h"),     # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, n=1, threshold=0.7).collect()
    }
    got_rows = prefix_filter_jaccard_pairs(
        df, n=1, threshold_num=7, threshold_den=10
    ).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert got == exact
    # jaccard accounting exact: pair (1,6) identical sets
    by = {(r.id_a, r.id_b): r for r in got_rows}
    assert by[(1, 6)].common == 8 and by[(1, 6)].jaccard_bp == 10000


def test_prefix_filter_boundary_is_integer_exact(spark):
    # sets of size 10 sharing exactly 7 tokens: J = 7/13 < 0.7 -> excluded;
    # sharing 9: J = 9/11 > 0.7 -> included. Boundary J == 0.7 needs
    # common*10 == 7*union: common=7, union=10 -> a 7-subset of a 10-set
    from payroll_etl_fastapi_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    ten = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    seven = "t1 t2 t3 t4 t5 t6 t7"
    df = spark.createDataFrame(
        [(1, ten), (2, seven)], "doc_id long, text string"
    )
    got = prefix_filter_jaccard_pairs(
        df, n=1, threshold_num=7, threshold_den=10
    ).collect()
    # J = 7/10 exactly == threshold -> INCLUDED (>=, exact integers)
    assert len(got) == 1 and got[0].jaccard_bp == 7000


def test_containment_catches_fragment_jaccard_misses(spark):
    """A fragment whose shingles are a strict subset of its source scores
    10000 bp containment on the fragment side while its Jaccard sits below
    the 0.5 dedup threshold — the quote-inclusion blind spot."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 8 shingles
            (2, "a b c d e"),             # 3 shingles, all ⊂ doc 1
            (3, "x y z w v u"),           # unrelated
        ],
        "doc_id long, text string",
    )
    rows = dedup.containment_pairs(
        docs, min_containment_bp=8000, max_df=16
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert (r["common"], r["na"], r["nb"]) == (3, 8, 3)
    assert r["cont_b_bp"] == 10000
    assert r["cont_a_bp"] == 3750
    # the symmetric gate at the standard threshold misses this pair
    assert (
        dedup.ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    )


def test_containment_df_cap_excludes_boilerplate_shingles(spark):
    """A shingle shared by more than max_df docs is corpus boilerplate:
    it contributes to neither intersections nor sizes."""
    boiler = [(i, "the same boiler plate line") for i in range(1, 6)]
    docs = spark.createDataFrame(boiler, "doc_id long, text string")
    # df of every shingle is 5 > max_df=4 → whole universe capped away
    assert dedup.containment_pairs(docs, max_df=4).count() == 0
    # at max_df=8 the five identical docs pair up fully
    rows = dedup.containment_pairs(docs, max_df=8).collect()
    assert len(rows) == 10  # C(5,2)
    assert all(r["cont_a_bp"] == 10000 and r["cont_b_bp"] == 10000 for r in rows)


def test_keep_best_prefers_longest_not_first(spark):
    """The keep-best selection picks the highest-token member of each
    cluster — NOT the smallest id — with smallest-id only as tiebreak."""
    from payroll_etl_fastapi_spark.plans.suite import QUERIES

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma"),                          # half of 1
            (3, "alpha beta gamma delta epsilon zeta eta"),   # longer of 1
            (9, "unrelated words entirely different tokens"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.containment_pairs(corpus, min_containment_bp=8000, max_df=16)
    cc = dedup.connected_components(pairs.select("id_a", "id_b"))
    toklen = corpus.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(dedup.normalize_text(F.col("text")), " ")).alias("n"),
    )
    m = cc.join(toklen, "id")
    best = (
        m.groupBy("component")
        .agg(F.max(F.struct(F.col("n"), (-F.col("id")).alias("ni"))).alias("b"))
        .select("component", (-F.col("b.ni")).alias("kept"))
        .collect()
    )
    assert len(best) == 1
    assert best[0]["kept"] == 3  # the longest variant, not doc 1


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) dedup
# ---------------------------------------------------------------------------


def test_incremental_dedup_decisions_and_index_growth(spark, tmp_path):
    """Snapshot 1 builds the index; a batch with an exact index dup, a
    near-dup of an index doc, an intra-batch near-dup and a fresh doc gets
    the right per-doc decision; the index grows append-only by bands×accepted
    rows and the change feed emits exactly the accepted band rows."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    snap1 = corpus(
        spark,
        [
            (1, base + "one two three four five six seven eight"),
            (2, "completely different text about spark catalyst plans " * 3),
        ],
    )
    index = TxTable(spark, str(tmp_path / "band_index"))
    d1 = {r.id: r for r in dedup.incremental_minhash_dedup(index, snap1).collect()}
    assert d1[1].accepted and d1[2].accepted
    v1 = index.latest_version()
    n1 = index.snapshot().count()
    assert n1 == 2 * 4  # bands=4 rows per accepted doc

    batch = corpus(
        spark,
        [
            (10, base + "one two three four five six seven eight"),  # exact dup of 1
            (11, base + "one two three four five six seven eight qq ww ee"),  # near-dup of 1
            (20, "brand new unrelated content mentioning tungsten codegen " * 3),
            (21, "brand new unrelated content mentioning tungsten codegen " * 3 + "zz"),  # near-dup of 20
        ],
    )
    d2 = {r.id: r for r in dedup.incremental_minhash_dedup(index, batch).collect()}
    assert not d2[10].accepted and d2[10].matched_id == 1 and d2[10].est_jaccard == 1.0
    assert not d2[11].accepted and d2[11].matched_id == 1
    assert d2[20].accepted and d2[20].matched_id is None
    assert not d2[21].accepted and d2[21].matched_id == 20
    v2 = index.latest_version()
    assert v2 > v1
    assert index.snapshot().count() == n1 + 1 * 4  # only doc 20 admitted

    # change feed between snapshots = exactly the accepted band rows
    feed = index.changes(v1, v2, keys=["band", "sig", "id"])
    ins = feed.filter(F.col("_change_type") == "insert")
    assert ins.count() == 4
    assert [r.id for r in ins.select("id").distinct().collect()] == [20]

    # re-ingesting the SAME batch admits zero docs (every doc self-matches
    # at est 1.0 — rejected docs because their match is in the index now or
    # still, accepted docs because they ARE in the index)
    d3 = {r.id: r for r in dedup.incremental_minhash_dedup(index, batch).collect()}
    assert all(not r.accepted for r in d3.values())
    assert d3[20].matched_id == 20 and d3[20].est_jaccard == 1.0
    assert index.snapshot().count() == n1 + 4  # no growth on re-ingest
    # index history is append-only: every commit action is append
    assert {h["operation"] for h in index.history()} == {"append"}


def test_incremental_dedup_greedy_rejection_chain(spark, tmp_path):
    """Pin the greedy-by-pairs quirk (VERDICT r6 #4): a doc whose ONLY
    verified match is another doc that was itself rejected is still
    REJECTED, with the rejected doc as its matched_id. Chain: A~B (est 0.5),
    B~C (est 0.625), A!~C (est 0.125, no shared band). Greedy keep-first by
    pairs: A accepted; B rejected (matched A); C rejected (matched B — a doc
    that did not survive). A survivor-aware pass would ADMIT C; the driver
    oracle encodes the greedy semantics, so a future "fix" must change both
    engine and oracle together, not silently. Texts are a shared-middle
    construction (A = wA+wS, B = wA+wS+wC, C = wS+wC) found by seeded search
    against the real pipeline (n=3 word shingles, 16 hashes, 4 bands,
    seed 42)."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    a_txt = (
        "tok356 tok228 tok136 tok369 tok117 tok302 tok052 tok162 "
        "tok015 tok011 tok013 tok332 tok277 tok004"
    )
    c_txt = (
        "tok015 tok011 tok013 tok332 tok277 tok004 tok195 tok351 "
        "tok110 tok216 tok371 tok014 tok270 tok113"
    )
    b_txt = a_txt + " tok195 tok351 tok110 tok216 tok371 tok014 tok270 tok113"
    batch = corpus(spark, [(1, a_txt), (2, b_txt), (3, c_txt)])
    index = TxTable(spark, str(tmp_path / "chain_idx"))
    d = {r.id: r for r in dedup.incremental_minhash_dedup(index, batch).collect()}
    assert d[1].accepted and d[1].matched_id is None
    assert not d[2].accepted and d[2].matched_id == 1 and d[2].est_jaccard == 0.5
    # the pinned quirk: C's match is B (id 2) — itself rejected
    assert not d[3].accepted and d[3].matched_id == 2 and d[3].est_jaccard == 0.625
    # C has no verified match against the lone survivor A
    # (a survivor-aware semantics would therefore have admitted it)
    assert index.snapshot().count() == 4  # only A's 4 band rows admitted
    assert sorted({r.id for r in index.snapshot().collect()}) == [1]


def test_incremental_dedup_matches_from_scratch_keep_first(spark, tmp_path):
    """Cross-snapshot greedy ingest must admit the SAME representative set a
    from-scratch LSH keep-first pass over the union admits, when snapshots
    arrive in id order (the production contract: ingest order = id order)."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    rows = []
    for d in range(12):
        text = f"document number {d % 4} with shared phrasing alpha beta gamma delta epsilon zeta " * 2
        rows.append((d, text))  # 4 distinct texts, each ×3 exact dups
    all_docs = corpus(spark, rows)
    snap1 = all_docs.filter(F.col("doc_id") < 6)
    snap2 = all_docs.filter(F.col("doc_id") >= 6)

    index = TxTable(spark, str(tmp_path / "idx"))
    a1 = dedup.incremental_minhash_dedup(index, snap1)
    acc1 = sorted(r.id for r in a1.collect() if r.accepted)
    a2 = dedup.incremental_minhash_dedup(index, snap2)
    acc2 = sorted(r.id for r in a2.collect() if r.accepted)

    # from-scratch: keep-first = docs with no verified lower-id match
    sig = dedup.minhash_signatures(all_docs, "text", "doc_id", num_hashes=16)
    cand = dedup._lsh_candidates(sig, 16, 4)
    pairs = dedup.minhash_lsh_pairs(all_docs, "text", "doc_id", min_est=0.5)
    dup_ids = {r.id_b for r in pairs.collect()}
    expect = sorted(set(range(12)) - dup_ids)
    assert acc1 + acc2 == expect == [0, 1, 2]  # text 3 is a 0.625-est near-dup of text 1


def test_lsh_pair_recall_s_curve_shape(spark):
    """Retrieval-quality floor for the banding S-curve (round 7, the dedup
    sibling of the ANN recall floors): the dedup_lsh_pair_recall gate's
    measured per-bucket recall must have the 1-(1-j^4)^4 shape — near-zero
    below j=0.3, mid-range in the transition band, near-one above j=0.8.
    A band-layout / hash-fold bug that guts pair recall (the class the
    determinism gates cannot see) flips these bands decisively; the wide
    margins survive testdata regeneration. Full frontier:
    tools/dedup_quality.py + PLANS.md §near-dup quality."""
    from payroll_etl_fastapi_spark.plans.suite_dedup import dedup_lsh_pair_recall

    rows = {r.bucket: r for r in dedup_lsh_pair_recall(
        spark, "/root/testdata/sf0.01").collect()}
    # integer contract: recall_bp = n_hit * 10000 // n_true, hits <= truths
    for r in rows.values():
        assert 0 <= r.n_hit <= r.n_true
        assert r.recall_bp == r.n_hit * 10000 // r.n_true
    checked = 0
    for b, r in rows.items():
        if r.n_true < 20:
            continue  # singleton rounding buckets carry no signal
        if b <= 2:  # j < 0.3: theory <= 0.025
            assert r.recall_bp <= 1500, (b, r)
        elif b == 4:  # j ~ 0.45: theory ~ 0.10-0.20
            assert 200 <= r.recall_bp <= 4000, (b, r)
        elif b == 6:  # j ~ 0.65: theory ~ 0.5-0.7
            assert 3500 <= r.recall_bp <= 9000, (b, r)
        elif b >= 8:  # j >= 0.8: theory >= 0.91
            assert r.recall_bp >= 8500, (b, r)
        else:
            continue
        checked += 1
    assert checked >= 4  # the corpus must actually populate the curve


def test_lsh_params_for_satisfies_s_curve_constraints():
    from payroll_etl_fastapi_spark.operators.dedup import lsh_params_for

    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        num_hashes, bands = lsh_params_for(t)
        r = num_hashes // bands
        assert num_hashes % bands == 0  # feeds minhash_lsh_pairs directly
        assert 1 - (1 - t**r) ** bands >= 0.9  # at-threshold recall floor
        assert 1 - (1 - (t / 2) ** r) ** bands <= 0.2  # junk-mass cap
        assert num_hashes <= 256
    # higher thresholds are cheaper (the S-curve steepens)
    sizes = [lsh_params_for(t)[0] for t in (0.5, 0.7, 0.9)]
    assert sizes == sorted(sizes, reverse=True)
    # low thresholds are genuinely expensive: 0.4 needs >256 hashes — the
    # honest price, not a search bug
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no config"):
        lsh_params_for(0.4)
    num_hashes, bands = lsh_params_for(0.4, max_hashes=1024)
    r = num_hashes // bands
    assert 1 - (1 - 0.4**r) ** bands >= 0.9


def test_lsh_params_for_rejects_impossible_asks():
    import pytest as _pytest

    from payroll_etl_fastapi_spark.operators.dedup import lsh_params_for

    with _pytest.raises(ValueError, match="no config"):
        lsh_params_for(0.5, min_recall=0.95, max_fp_weight=0.1)
    with _pytest.raises(ValueError, match="threshold"):
        lsh_params_for(1.5)
    with _pytest.raises(ValueError, match="min_recall"):
        lsh_params_for(0.5, min_recall=1.0)


# ---------------------------------------------------------------------------
# round 8 (VERDICT r7 #2): the S-curve planner is WIRED into the public
# entry points — threshold= derives (num_hashes, bands) via lsh_params_for
# and must hit the planner-predicted recall on a planted jaccard grid.
# The raw-knob path stays byte-identical (the oracle gates keep their 16/4).
# ---------------------------------------------------------------------------


def _planted_grid(spark, n_docs=60, n_tokens=30, seed=99):
    """(df, true_ids, sub_ids): docs of random tokens plus one truncated
    copy per doc at keep=0.9 (pair jaccard ~0.89 — above the 0.7 plan
    threshold) and one at keep=0.5 (~0.46 — junk the plan must prune).
    Copy ids are base + 10_000 / + 20_000."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{rng.randrange(10**9):09d}" for _ in range(5000)]
    rows = []
    for i in range(n_docs):
        toks = rng.sample(vocab, n_tokens)
        rows.append((i, " ".join(toks)))
        rows.append((i + 10_000, " ".join(toks[: int(0.9 * n_tokens)])))
        rows.append((i + 20_000, " ".join(toks[: int(0.5 * n_tokens)])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    true_ids = {(i, i + 10_000) for i in range(n_docs)}
    sub_ids = {(i, i + 20_000) for i in range(n_docs)}
    return df, true_ids, sub_ids


def test_lsh_pairs_threshold_hits_planner_recall(spark):
    """minhash_lsh_pairs(threshold=0.7): the planner picks (36, 9) (r=4 —
    1-(1-0.7^4)^9 = 0.907 at-threshold), so planted j~0.89 pairs must be
    recovered at the S-curve's ~0.99 while j~0.46 copies stay pruned by
    the est >= 0.7 cutoff."""
    assert dedup.lsh_params_for(0.7) == (36, 9)
    df, true_ids, sub_ids = _planted_grid(spark)
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in dedup.minhash_lsh_pairs(df, threshold=0.7).collect()
    }
    assert len(got & true_ids) / len(true_ids) >= 0.95
    assert len(got & sub_ids) / len(sub_ids) <= 0.15


def test_lsh_pairs_threshold_equals_explicit_knobs(spark):
    """The planned path is sugar, not a fork: threshold=0.7 returns the
    identical pair set as the raw knobs it derives."""
    df, _, _ = _planted_grid(spark, n_docs=20)
    planned = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in dedup.minhash_lsh_pairs(df, threshold=0.7).collect()
    }
    raw = {
        (r.id_a, r.id_b, r.est_jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, num_hashes=36, bands=9, min_est=0.7
        ).collect()
    }
    assert planned == raw


def test_threshold_and_raw_knobs_conflict_raises(spark):
    df, _, _ = _planted_grid(spark, n_docs=2)
    with pytest.raises(ValueError, match="not both"):
        dedup.minhash_lsh_pairs(df, threshold=0.7, num_hashes=32, bands=8)
    with pytest.raises(ValueError, match="not both"):
        dedup.minhash_verified_pairs(
            df, threshold=0.7, plan_bands=True, num_hashes=32, bands=8
        )


def test_verified_pairs_plan_bands(spark):
    """minhash_verified_pairs(threshold=0.7, plan_bands=True): exact-verify
    on planner-derived candidates — planted j~0.89 pairs recovered, every
    reported jaccard exact and >= threshold."""
    df, true_ids, _ = _planted_grid(spark)
    rows = dedup.minhash_verified_pairs(df, threshold=0.7, plan_bands=True).collect()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in rows}
    assert len(got & true_ids) / len(true_ids) >= 0.95
    assert all(r.jaccard >= 0.7 for r in rows)


def test_incremental_dedup_threshold_param(spark, tmp_path):
    """incremental_minhash_dedup(threshold=0.7): same derivation; a batch
    holding a j~0.89 copy of an indexed doc is rejected with the copy's
    est >= 0.7, an unrelated doc is admitted."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    index = TxTable(spark, str(tmp_path / "band_index"))
    df, _, _ = _planted_grid(spark, n_docs=5)
    base = df.filter(F.col("doc_id") < 10_000)
    dec1 = dedup.incremental_minhash_dedup(index, base, threshold=0.7)
    assert all(r.accepted for r in dec1.collect())
    copies = df.filter((F.col("doc_id") >= 10_000) & (F.col("doc_id") < 20_000))
    dec2 = {r.id: r for r in dedup.incremental_minhash_dedup(
        index, copies, threshold=0.7).collect()}
    rejected = [r for r in dec2.values() if not r.accepted]
    assert len(rejected) >= 4  # S-curve ~0.99 at j~0.89; 5 planted copies
    assert all(r.est_jaccard >= 0.7 for r in rejected)


# ---------------------------------------------------------------------------
# round 8: duplicated-span REMOVAL (the cleaning half of duplicate_span_stats)
# ---------------------------------------------------------------------------


def _span8(words):
    return " ".join(words)


def test_remove_duplicate_spans_semantics(spark):
    """Shared 8-token window cut; unique windows and the sub-window tail
    survive; keep_first keeps the lowest-id occurrence only."""
    boiler = _span8([f"b{i}" for i in range(8)])  # the shared span
    uniq1 = _span8([f"u{i}" for i in range(8)])
    uniq2 = _span8([f"v{i}" for i in range(8)])
    df = corpus(
        spark,
        [
            (1, f"{boiler} {uniq1} tail one"),
            (2, f"{uniq2} {boiler} extra"),
            (3, "short doc"),
        ],
    )
    out = {
        r.id: r
        for r in dedup.remove_duplicate_spans(df, keep_first=False).collect()
    }
    # boiler appears in 2 distinct docs -> removed EVERYWHERE
    assert out[1].text_clean == f"{uniq1} tail one"
    assert out[2].text_clean == f"{uniq2} extra"
    assert (out[1].n_spans, out[1].kept_spans) == (2, 1)
    # docs shorter than one window pass through verbatim (tail-only)
    assert out[3].text_clean == "short doc"
    assert (out[3].n_spans, out[3].kept_spans) == (0, 0)

    kept = {
        r.id: r
        for r in dedup.remove_duplicate_spans(df, keep_first=True).collect()
    }
    # the lowest-id occurrence is the canonical copy and survives
    assert kept[1].text_clean == f"{boiler} {uniq1} tail one"
    assert kept[2].text_clean == f"{uniq2} extra"


def test_remove_duplicate_spans_preserves_order(spark):
    """Kept spans rebuild in original position order even when the window
    aggregate scrambles them."""
    spans = [_span8([f"w{j}_{i}" for i in range(8)]) for j in range(5)]
    text = " ".join(spans) + " tl"
    df = corpus(spark, [(1, text), (2, "unrelated words here")])
    out = {r.id: r for r in dedup.remove_duplicate_spans(df).collect()}
    assert out[1].text_clean == text
    assert (out[1].n_spans, out[1].kept_spans) == (5, 5)


def test_remove_duplicate_spans_self_repeat_not_cross_doc(spark):
    """A doc repeating its own span is NOT cross-document duplication
    (min_docs counts DISTINCT docs) — both occurrences survive."""
    s = _span8([f"r{i}" for i in range(8)])
    df = corpus(spark, [(1, f"{s} {s}"), (2, "other content entirely")])
    out = {r.id: r for r in dedup.remove_duplicate_spans(df).collect()}
    assert out[1].text_clean == f"{s} {s}"
    assert out[1].kept_spans == 2


# ---------------------------------------------------------------------------
# round 8: incremental exact-substring (span) ingest — incremental trio
# ---------------------------------------------------------------------------


def _span_text(prefix, n=16):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_incremental_span_dedup_rejects_recycled_content(spark, tmp_path):
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    idx = TxTable(spark, str(tmp_path / "span_idx"))
    snap_a = corpus(
        spark, [(1, _span_text("a")), (2, _span_text("b")), (3, "tiny")]
    )
    dec_a = {r.id: r for r in dedup.incremental_span_dedup(idx, snap_a).collect()}
    assert all(r.accepted for r in dec_a.values())
    assert dec_a[3].n_spans == 0  # sub-window doc: accepted, appends nothing
    v1 = idx.snapshot().count()
    assert v1 == 4  # 2 distinct spans per 16-token doc

    # batch B: a verbatim copy of doc 1 (100% dup -> rejected), a half-
    # recycled doc (1 span from doc 2 + 1 fresh -> 5000 bp -> rejected at
    # the default threshold), and a fresh doc (accepted)
    half = " ".join(_span_text("b").split()[:8]) + " " + _span_text("c", 8)
    snap_b = corpus(
        spark,
        [(10, _span_text("a")), (11, half), (12, _span_text("d"))],
    )
    dec_b = {r.id: r for r in dedup.incremental_span_dedup(idx, snap_b).collect()}
    assert (dec_b[10].accepted, dec_b[10].dup_bp) == (False, 10000)
    assert (dec_b[11].accepted, dec_b[11].dup_bp) == (False, 5000)
    assert (dec_b[12].accepted, dec_b[12].dup_bp) == (True, 0)
    # append-only growth: only doc 12's 2 distinct spans landed
    assert idx.snapshot().count() == v1 + 2

    # re-ingest idempotence: every spanful doc self-matches at 10000 bp
    dec_c = {r.id: r for r in dedup.incremental_span_dedup(idx, snap_a).collect()}
    assert not dec_c[1].accepted and not dec_c[2].accepted
    assert dec_c[3].accepted  # span-less doc stays accepted, appends nothing
    assert idx.snapshot().count() == v1 + 2


def test_incremental_span_dedup_in_batch_keep_first(spark, tmp_path):
    """Two copies in ONE batch: the lower id wins; the higher id's spans
    all match a lower-id doc."""
    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    idx = TxTable(spark, str(tmp_path / "span_idx2"))
    batch = corpus(
        spark, [(5, _span_text("x")), (9, _span_text("x")), (7, _span_text("y"))]
    )
    dec = {r.id: r for r in dedup.incremental_span_dedup(idx, batch).collect()}
    assert dec[5].accepted and dec[7].accepted
    assert (dec[9].accepted, dec[9].dup_bp) == (False, 10000)


def test_lsh_params_for_low_thresholds_raise_cleanly():
    """threshold**rows underflows 1-p to 1.0 at low thresholds; the log1p
    form must reject them with the planner's ValueError, never a
    ZeroDivisionError (found by the r9 Pipeline facade validation)."""
    import pytest as _pytest

    for t in (0.05, 0.1, 0.2, 0.3):
        with _pytest.raises(ValueError, match="no config"):
            dedup.lsh_params_for(t)
    # the pinned pick is unchanged by the numeric fix
    assert dedup.lsh_params_for(0.7) == (36, 9)
