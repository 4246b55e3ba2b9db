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


# ---------------------------------------------------------------------------
# unigram-LM (round 9): Viterbi exactness vs a python dp replica, tie order,
# coverage, and the EM prune/smoothing rules
# ---------------------------------------------------------------------------


def _viterbi_replica(word: str, costs: dict[str, int], maxlen: int = 4):
    """Exact dp twin of unigram_viterbi_tokenize's fold: (cost, -len, seg)
    argmin per position."""
    INF = float("inf")
    dp: list[tuple[float, str]] = [(0, "")] + [(INF, "")] * len(word)
    for i in range(1, len(word) + 1):
        best = None
        for l in range(1, min(maxlen, i) + 1):
            piece = word[i - l : i]
            if piece not in costs or dp[i - l][0] == INF:
                continue
            seg = (dp[i - l][1] + " " + piece).strip()
            cand = (dp[i - l][0] + costs[piece], -l, seg)
            if best is None or cand < best:
                best = cand
        assert best is not None
        dp[i] = (best[0], best[2])
    return dp[len(word)][1].split(" "), dp[len(word)][0]


def test_unigram_viterbi_matches_python_replica(spark):
    words = spark.createDataFrame(
        [("batch", 3), ("tata", 5), ("a", 2), ("catch", 1)], "word string, n long"
    )
    costs = [
        ("a", 100), ("b", 900), ("t", 500), ("c", 800), ("h", 700),
        ("at", 450), ("ta", 300), ("tat", 900), ("atch", 1200), ("batc", 1100),
    ]
    got = {
        r.word: (list(r.pieces), int(r.cost_micros))
        for r in bpe.unigram_viterbi_tokenize(words, costs).collect()
    }
    cd = dict(costs)
    for w in ("batch", "tata", "a", "catch"):
        assert got[w] == _viterbi_replica(w, cd), w
    # viterbi beats greedy longest-match where greedy commits early:
    # 'tata' -> ta+ta (600) not tat+a (1000)
    assert got["tata"][0] == ["ta", "ta"]


def test_unigram_viterbi_tie_prefers_longer_piece(spark):
    words = spark.createDataFrame([("ab", 1)], "word string, n long")
    # a+b == ab == 200: the longer piece wins the (cost, -len, seg) order
    costs = [("a", 100), ("b", 100), ("ab", 200)]
    rows = bpe.unigram_viterbi_tokenize(words, costs).collect()
    assert list(rows[0].pieces) == ["ab"]


def test_unigram_seed_keeps_all_chars_and_caps_multis(spark):
    words = spark.createDataFrame(
        [("aaab", 10), ("zq", 1)], "word string, n long"
    )
    seed = bpe.unigram_seed(words, seed_multi=2, max_piece_len=3, min_count=2)
    singles = {p for p, _ in seed if len(p) == 1}
    multis = [p for p, _ in seed if len(p) > 1]
    assert singles == {"a", "b", "z", "q"}  # every observed char, rare or not
    assert len(multis) == 2  # capped at seed_multi
    # weighted counts: 'aa' occurs at 2 positions x n=10 = 20, top multi
    assert multis[0] == "aa" and dict(seed)["aa"] == 20


def test_train_unigram_prunes_and_smooths(spark):
    words = spark.createDataFrame(
        [("abab", 50), ("cd", 1)], "word string, n long"
    )
    costs = dict(
        bpe.train_unigram(
            words, vocab_multi=1, seed_multi=8, max_piece_len=3, min_count=1,
            n_rounds=2,
        )
    )
    # all chars survive with finite costs even at zero usage (add-one)
    assert {"a", "b", "c", "d"} <= set(costs)
    # exactly one multi-char piece survives the prune
    assert len([p for p in costs if len(p) > 1]) == 1
    # and the survivor is the dominant 'ab'
    assert "ab" in costs


def test_unigram_costs_formula():
    import math

    got = dict(bpe.unigram_costs([("a", 3), ("b", 1)]))
    assert got["a"] == int(math.floor(-math.log(3 / 4) * 1e6 + 0.5))
    assert got["b"] == int(math.floor(-math.log(1 / 4) * 1e6 + 0.5))


def test_unigram_tokenize_docs_reassembles_in_order(spark):
    docs = spark.createDataFrame(
        [(1, "tata batch"), (2, "A1-mixed tata")], "doc_id long, text string"
    )
    costs = [
        ("a", 100), ("b", 900), ("t", 500), ("c", 800), ("h", 700),
        ("at", 450), ("ta", 300), ("batc", 1100),
    ]
    out = {r.id: r for r in bpe.unigram_tokenize_docs(docs, costs).collect()}
    # doc 1: 'tata' -> ta ta (600), 'batch' -> ... viterbi; word order kept
    assert list(out[1].pieces)[:2] == ["ta", "ta"]
    assert out[1].n_pieces == len(out[1].pieces)
    # non-alpha token passes through whole at zero cost
    p2 = list(out[2].pieces)
    assert "a1-mixed" in p2  # normalized lowercase token, outside [a-z]+
    assert p2[-2:] == ["ta", "ta"]
    assert out[2].cost_micros == 600  # only 'tata' carries trained cost
