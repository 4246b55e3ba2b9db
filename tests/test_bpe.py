"""operators/bpe.py: train_bpe vs an exact Python replica of textbook BPE
(leftmost-first non-overlapping merges, count-then-lex tie order), the
adjacent-occurrence overlap rule, and early stop."""

from __future__ import annotations

from payroll_etl_fastapi_spark.operators import bpe


def _replica(wc: dict[str, int], n_merges: int):
    seqs = {w: (list(w), n) for w, n in wc.items()}
    out = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, n in seqs.values():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + n
        if not counts:
            break
        (l, r), c = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((step, l, r, c))
        for w, (s, n) in seqs.items():
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seqs[w] = (ns, n)
    return out


def _words(spark, wc):
    return spark.createDataFrame(list(wc.items()), "word string, n long")


def test_matches_python_replica(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2}
    assert bpe.train_bpe(_words(spark, wc), 8) == _replica(wc, 8)


def test_adjacent_overlap_merges_leftmost_first(spark):
    # 'aaaa' has three (a,a) adjacencies but only TWO leftmost-first
    # non-overlapping merges: [a,a,a,a] -> [aa,aa], never [a,aa,a]
    wc = {"aaaa": 1}
    got = bpe.train_bpe(_words(spark, wc), 2)
    assert got[0] == (1, "a", "a", 3)  # count sees all 3 adjacencies
    assert got[1] == (2, "aa", "aa", 1)  # but the merge left [aa, aa]


def test_early_stop_when_no_pairs_remain(spark):
    wc = {"ab": 1}
    got = bpe.train_bpe(_words(spark, wc), 5)
    assert got == [(1, "a", "b", 1)]  # single merge exhausts every pair


def test_word_counts_restricts_alphabet(spark):
    docs = spark.createDataFrame(
        [(1, "Foo foo 123 bar-baz qux")], "doc_id long, text string"
    )
    got = {r.word: r.n for r in bpe.word_counts(docs).collect()}
    assert got == {"foo": 2, "qux": 1}  # digits/punct words excluded


def test_apply_merges_matches_trainer_state(spark):
    # applying the trained merges from scratch must reproduce the exact
    # token sequences the trainer ended with
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    words = _words(spark, wc)
    merges = bpe.train_bpe(words, 6)
    got = {r.word: list(r.seq) for r in bpe.apply_merges(words, merges).collect()}

    def replica_seqs(wc, ms):
        seqs = {w: list(w) for w in wc}
        for _, l, r, _c in ms:
            for w, s in seqs.items():
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                seqs[w] = ns
        return seqs

    assert got == replica_seqs(wc, merges)


# ---------------------------------------------------------------------------
# round 8: WordPiece-style greedy longest-match tokenization
# ---------------------------------------------------------------------------


def test_wordpiece_greedy_semantics_and_coverage(spark):
    from payroll_etl_fastapi_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "spark sparkle park parking sparks"), (2, "spark park dark")],
        "doc_id long, text string",
    )
    words = B.word_counts(docs)
    vocab = B.wordpiece_vocab(words, vocab_size=8, min_count=2)
    assert "park" in vocab and "spa" in vocab
    out = {r.word: list(r.pieces) for r in B.wordpiece_tokenize(words, vocab).collect()}
    # greedy takes the LONGEST piece at each position even when globally
    # suboptimal: 'spa' (3) wins over 'sp' at pos 1, leaving 'rk' — never
    # the 2-piece 's'+'park' split a shortest-path tokenizer would find
    assert out["spark"] == ["spa", "rk"]
    assert out["park"] == ["park"]
    # single-character fallback covers unmatched positions
    assert out["dark"] == ["d", "ark"]
    assert out["parking"] == ["park", "i", "n", "g"]
    # the segmentation always reconstructs the word exactly
    for w, pieces in out.items():
        assert "".join(pieces) == w


def test_wordpiece_short_words_and_vocab_bounds(spark):
    from payroll_etl_fastapi_spark.operators import bpe as B

    docs = spark.createDataFrame(
        [(1, "a a a ab ab abc")], "doc_id long, text string"
    )
    words = B.word_counts(docs)
    vocab = B.wordpiece_vocab(words, vocab_size=4, min_count=2)
    # single chars never enter the stored vocab; sub-length words emit no
    # truncated slices (the Spark sequence(1,0) descending-range guard)
    assert all(len(v) >= 2 for v in vocab)
    assert "ab" in vocab and "abc" not in vocab  # abc count 1 < min_count
    out = {r.word: list(r.pieces) for r in B.wordpiece_tokenize(words, vocab).collect()}
    assert out["a"] == ["a"]
    assert out["ab"] == ["ab"]
    assert out["abc"] == ["ab", "c"]
