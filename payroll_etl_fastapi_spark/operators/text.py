"""Text-analysis operators over document tables — the training-data-pipeline
extension family (no reference counterpart; /root/reference has no text data).

Everything is built-in column expressions (split / filter / aggregate /
regexp_count): the hot path stays inside whole-stage codegen, no Python UDFs.
Each operator has a bit-exact SQL twin in plans/suite_text.py:

- language-ID: marker-token counting against per-language profiles, argmax
  with a fixed comparison chain — integer counts, so engines cannot diverge;
- quality scoring: length / punctuation / stopword / token-shape components
  combined with fixed double arithmetic from integer inputs;
- token counting: whitespace tokens and a BPE-ish regex family (word pieces,
  digit runs, punctuation singletons);
- document fingerprinting: rolling polynomial hash over tokens (Karp-Rabin
  style) — a sequential integer fold, exact in any engine.

Scale notes (100 TB): all operators are embarrassingly parallel per-row
projections — no shuffle at all until the caller aggregates. Marker profiles
are literal arrays (a few dozen strings), far below any broadcast concern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed public stopword-marker profiles; keys sorted = argmax tiebreak order
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ein"],
    "en": ["the", "and", "of", "to", "was"],
    "es": ["el", "que", "los", "una", "por"],
    "fr": ["le", "et", "les", "des", "dans"],
    "zh": ["的", "是", "了", "我", "不"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]

# rolling-hash constants (Karp-Rabin): small enough that B * h + t stays
# far under 2^63 (P*31 + 2^28 << 2^63) — no overflow in either engine
FP_BASE = 31
FP_MOD = (1 << 44) - 17  # prime


def normalize_text(c: Column) -> Column:
    """lower + collapse whitespace + trim — the dedup family's normalizer."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokens of normalized text ('' → empty array, not [''])."""
    norm = normalize_text(c)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def marker_count(toks: Column, markers: list[str]) -> Column:
    """How many tokens are in the marker list (integer; duplicates count)."""
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def language_scores(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Pass a precomputed `toks` column (withColumn(tokens(text))) when
    scoring in bulk: referencing a materialized column lets codegen split
    the text once per row instead of once per language profile — measured
    ~2× on the language-ID query at sf0.1."""
    toks = tokens(text) if toks is None else toks
    return {lang: marker_count(toks, m) for lang, m in LANG_PROFILES.items()}


def predicted_language(text: Column, toks: Column | None = None) -> Column:
    """Argmax over profile scores; ties resolved by the fixed lang order; all
    scores 0 → 'und'. The CASE chain is the determinism contract — the SQL
    twin spells out the identical chain."""
    scores = language_scores(text, toks)
    langs = sorted(scores)
    pred: Column = F.lit("und")
    # build the chain back-to-front so earlier langs win ties
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if other != lang and langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def quality_components(text: Column) -> dict[str, Column]:
    """Integer components of the quality score (exact in both engines)."""
    norm = normalize_text(text)
    toks = tokens(text)
    return {
        "n_chars": F.length(norm),
        "n_tokens": F.size(toks),
        "n_stopwords": marker_count(toks, STOPWORDS),
        "n_punct": F.regexp_count(norm, F.lit(r"[^\w\s]")),
        "n_digits": F.regexp_count(norm, F.lit(r"[0-9]")),
        "n_long_tokens": F.size(F.filter(toks, lambda t: F.length(t) >= 4)),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: stopword presence, token-shape and
    low-symbol-noise signals — fixed double arithmetic from the integer
    components, identical op order in the SQL twin."""
    c = quality_components(text)
    nt = F.greatest(c["n_tokens"], F.lit(1)).cast("double")
    nc = F.greatest(c["n_chars"], F.lit(1)).cast("double")
    stop_ratio = c["n_stopwords"].cast("double") / nt
    long_ratio = c["n_long_tokens"].cast("double") / nt
    punct_ratio = c["n_punct"].cast("double") / nc
    digit_ratio = c["n_digits"].cast("double") / nc
    length_ok = F.when(
        (c["n_tokens"] >= 10) & (c["n_tokens"] <= 100000), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.3) * length_ok
        + F.lit(0.3) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * long_ratio
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0)))
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio * 10.0, F.lit(1.0)))
    )


def bpe_token_count(text: Column) -> Column:
    """BPE-ish sub-token count: word pieces of ≤4 chars count 1, longer words
    count ceil(len/4); digit runs and punctuation marks count 1 each. A cheap
    deterministic proxy for a real tokenizer's token count."""
    norm = normalize_text(text)
    word_pieces = F.aggregate(
        F.regexp_extract_all(norm, F.lit("[a-z]+"), 0),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    digit_runs = F.regexp_count(norm, F.lit("[0-9]+")).cast("long")
    punct = F.regexp_count(norm, F.lit(r"[^\w\s]")).cast("long")
    return word_pieces + digit_runs + punct


def token_hash(tok: Column) -> Column:
    """28-bit token hash from md5 — the dedup family's shared hash (DuckDB
    twin: CAST(('0x' || substr(md5(t),1,7)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(tok), 1, 7), 16, 10).cast("long")


def doc_fingerprint(text: Column) -> Column:
    """Rolling polynomial (Karp-Rabin) fingerprint over tokens:
    h ← (h * B + hash(tok)) mod P, sequential left fold. Order-sensitive —
    permuted documents get different fingerprints, unlike bag-of-shingles."""
    return F.aggregate(
        F.transform(tokens(text), token_hash),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * FP_BASE + t) % FP_MOD,
    )


# -- intra-document repetition (Gopher-style quality signals) ----------------

# Thresholds in basis points, set from the corpus distribution (p99 of
# dup2_bp ≈ 1040, p99 of top2_bp ≈ 1110 at sf0.01) so the flag marks the
# genuinely repetitive tail, not the bulk.
REP_DUP2_BP = 900
REP_TOP2_BP = 1000


def ngrams(toks: Column, n: int) -> Column:
    """All word n-grams in order, duplicates kept (unlike dedup.shingles,
    which distincts before exploding). Built by zipping n shifted slices of
    the token array — the token expression is evaluated once per row, never
    inside a per-element lambda. Fewer than n tokens → empty array."""
    cnt = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, cnt) for k in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))


def max_multiplicity(arr: Column) -> Column:
    """Multiplicity of the most frequent element — computed array-locally:
    sort, then a single aggregate() scan tracking the longest run of equal
    neighbors. The shuffle-free twin of ``SELECT max(c) FROM (... GROUP BY
    elem)``: no explode, no exchange, stays in whole-stage codegen. Empty
    array → 0."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        # x == null-prev yields NULL → otherwise-branch → run restarts at 1
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), acc0, step, lambda acc: acc["best"])


def repetition_metrics(text: Column) -> Column:
    """Integer building blocks of the Gopher-style repetition signals as ONE
    struct column (g2_total, g2_distinct, g3_total, g3_distinct, top2_count):
    duplicate 2-/3-gram counts and the multiplicity of the most common
    2-gram. Everything is array-local per document — a corpus-wide
    repetition scrub is a pure projection, zero shuffles.

    The n-gram pipelines are ``let``-bound (operators.expr.let) so each is
    built exactly once per row: Catalyst's CSE does not reach inside
    higher-order functions, and the earlier dict-of-columns form re-ran the
    2-gram zip for every consumer — measured 3.5 s → 1.1 s on the sf0.1
    repetition gate with identical results."""
    from payroll_etl_fastapi_spark.operators.expr import let

    def _metrics(g2: Column, g3: Column) -> Column:
        return F.struct(
            F.size(g2).cast("long").alias("g2_total"),
            F.size(F.array_distinct(g2)).cast("long").alias("g2_distinct"),
            F.size(g3).cast("long").alias("g3_total"),
            F.size(F.array_distinct(g3)).cast("long").alias("g3_distinct"),
            max_multiplicity(g2).alias("top2_count"),
        )

    def _grams(tk: Column) -> Column:
        return let(_metrics, g2=ngrams(tk, 2), g3=ngrams(tk, 3))

    return let(_grams, tk=tokens(text))


def unigram_lm_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    snap_micros: bool = False,
):
    """Per-document negative log-likelihood under the corpus's own unigram
    language model with add-alpha smoothing — the classic LM-based quality
    signal (CCNet/RedPajama-style filtering, reduced to the unigram case so
    it is exactly SQL-replayable): documents full of rare or garbage tokens
    score HIGH (surprising), plain prose scores LOW.

    Output: (id, n_tokens, avg_neg_log_prob) — one row per document with at
    least one token; p(tok) = (count(tok) + α) / (N + α·V) over the whole
    corpus (N = total tokens, V = vocabulary size).

    Plan shape (100 TB): one explode pass over the corpus; ONE token-keyed
    aggregate builds the vocabulary; N and V ride in as a broadcast 1-row
    cross join (never a driver collect); the token→count attach is a plain
    shuffle join on the token key — the vocab side is 1 row per token so
    there is no row amplification, and hot-token partitions are AQE
    skew-split. No Python anywhere.

    ``snap_micros=True`` snaps each token's neg-log-p to integer
    microunits BEFORE the per-doc sum (the suite's determinism convention:
    cross-row double sums are order-dependent; integer sums are not), then
    derives the average with fixed op order — the oracle-replayable mode."""
    # no parallelism floor: the tokenize feeds an explode→groupBy, so the
    # shuffle already spreads the heavy side; the floor's exchange measured
    # net-negative here (1.0 s → 1.4 s at sf0.1)
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = vocab.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count(F.lit(1)).cast("double").alias("v_size"),
    )
    neg_log_p = -F.log(
        (F.col("cnt") + F.lit(alpha)) / (F.col("n_total") + F.lit(alpha) * F.col("v_size"))
    )
    joined = toks.join(vocab, "tok").crossJoin(F.broadcast(totals))
    if snap_micros:
        per_tok = F.floor(neg_log_p * F.lit(1e6) + F.lit(0.5)).cast("long")
        return joined.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.sum(per_tok) / F.count(F.lit(1)) / F.lit(1e6)
            ).alias("avg_neg_log_prob"),
        )
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(neg_log_p).alias("avg_neg_log_prob"),
    )


def bigram_counts(
    docs, text_col: str = "text", id_col: str = "doc_id"
):
    """(w1, w2, c12): corpus-wide adjacent-bigram counts. Bigrams are built
    ARRAY-LOCALLY (zip of two shifted slices — no positional self-join, no
    shuffle before the grouped count), then one map-side-combined count."""
    toks = tokens(F.col(text_col))
    t = docs.select(toks.alias("t")).filter(F.size("t") >= 2)
    n_pairs = F.size(F.col("t")) - 1
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, n_pairs), F.slice(F.col("t"), 2, n_pairs)
    )
    return (
        t.select(F.explode(pairs).alias("p"))
        .select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def bigram_lm_scores(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    snap_micros: bool = False,
):
    """Per-document negative log-likelihood under the corpus's own BIGRAM
    language model with add-alpha smoothing — the conditional-probability
    step past unigram_lm_scores and the reduced-but-replayable form of the
    CCNet/KenLM perplexity filter: p(w2|w1) = (c(w1,w2) + α) / (c(w1·) +
    α·V), where c(w1·) counts w1 as a bigram CONTEXT and V is the corpus
    vocabulary size. Word-salad that passes a unigram filter (common words,
    nonsense order) scores HIGH here, because its transitions are unseen.

    Output: (id, n_bigrams, avg_neg_log_prob) — one row per document with
    ≥ 2 tokens.

    Plan shape (100 TB): bigrams are built ARRAY-LOCALLY per document (two
    shifted slices zipped — the bigram_counts shape, no positional
    self-join); ONE (w1, w2)-keyed aggregate builds the transition table;
    context counts derive from THAT table (a groupBy over distinct bigrams,
    not a second corpus pass); V is the one quantity that does NOT derive
    from the transition table (single-token docs contribute vocabulary but
    no bigram), so it costs one extra COLUMN-PRUNED corpus pass — a
    text-only scan feeding a countDistinct — broadcast in as a 1-row
    aggregate (ADVICE r8: this pass is deliberate, not shared).
    The two probability attaches are plain shuffle joins on (w1, w2) and
    w1 — 1 row per key on the model side, AQE skew-split hot contexts. No
    Python anywhere.

    ``snap_micros=True`` snaps each transition's neg-log-p to integer
    microunits before the per-doc sum (unigram_lm_scores' determinism
    convention) — the oracle-replayable mode."""
    toks = tokens(F.col(text_col))
    t = docs.select(F.col(id_col).alias("id"), toks.alias("t")).filter(
        F.size("t") >= 2
    )
    n_pairs = F.size(F.col("t")) - 1
    zipped = F.arrays_zip(
        F.slice(F.col("t"), 1, n_pairs), F.slice(F.col("t"), 2, n_pairs)
    )
    doc_pairs = t.select("id", F.explode(zipped).alias("p")).select(
        "id", F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2")
    )
    big = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vsize = docs.select(F.explode(tokens(F.col(text_col))).alias("tok")).agg(
        F.countDistinct("tok").cast("double").alias("v_size")
    )
    neg_log_p = -F.log(
        (F.col("c12") + F.lit(alpha))
        / (F.col("c1") + F.lit(alpha) * F.col("v_size"))
    )
    joined = (
        doc_pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vsize))
    )
    if snap_micros:
        per_pair = F.floor(neg_log_p * F.lit(1e6) + F.lit(0.5)).cast("long")
        return joined.groupBy("id").agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum(per_pair) / F.count(F.lit(1)) / F.lit(1e6)).alias(
                "avg_neg_log_prob"
            ),
        )
    return joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg(neg_log_p).alias("avg_neg_log_prob"),
    )


def pmi_collocations(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    top_k: int = 30,
):
    """Collocation mining by pointwise mutual information (the word2vec-
    phrases / NLTK collocation primitive): bigrams whose joint frequency
    beats chance, PMI = ln(c12·N / (c1·c2)) over adjacent token pairs,
    reported as the top_k strongest with exact supporting counts.

    Output: (w1, w2, c12, c1, c2, pmi_micro) — pmi snapped to integer
    microunits (the suite convention) so ordering and values replay in SQL;
    ties broken by (w1, w2).

    Plan shape (100 TB): bigram and unigram tables are each ONE explode +
    grouped count (map-side combine); the min_count filter prunes the long
    tail BEFORE the two unigram-attach joins (each a plain equality join
    against a 1-row-per-token side — no amplification, hot tokens are AQE
    skew keys); the top_k is TakeOrderedAndProject. N (total tokens) rides
    in as a broadcast 1-row cross join. ln arguments are computed with ONE
    division of exact integer-valued doubles, identically in both engines."""
    toks = tokens(F.col(text_col))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_total = uni.agg(F.sum("c").alias("n_total"))
    bi = bigram_counts(docs, text_col, id_col).filter(F.col("c12") >= min_count)
    joined = (
        bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(n_total))
    )
    pmi = F.log(
        (F.col("c12") * F.col("n_total")).cast("double")
        / (F.col("c1") * F.col("c2")).cast("double")
    )
    return (
        joined.select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.floor(pmi * F.lit(1e6) + F.lit(0.5)).cast("long").alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), "w1", "w2")
        .limit(top_k)
    )


def compression_ratio_stats(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    min_bp: int = 2500,
    max_bp: int = 11000,
):
    """Per-document zlib compression ratio in integer basis points — the
    language-agnostic quality filter (CCNet / RedPajama / Gopher lineage):
    highly repetitive or templated text compresses far below natural prose
    (low ratio_bp), while random or binary-ish garbage barely compresses
    (ratio_bp ≈ 10000+ with the zlib header overhead). ``flagged`` marks
    docs OUTSIDE [min_bp, max_bp] — both tails are quality failures.

    Output: (id, n_bytes, z_bytes, ratio_bp, flagged), empty docs emitting
    n_bytes = 0 / ratio_bp = 0 / unflagged.

    This is the module's documented Arrow-batched EXCEPTION to the
    no-Python rule (the multimodal decode discipline): DEFLATE is not
    expressible in SQL, so the pass runs as one mapInPandas projection —
    no shuffle, binary-free input, integer outputs. zlib with a fixed
    ``level`` is bit-deterministic for a given input (RFC 1950 stream,
    same library everywhere in the cluster image), and the pytest pins the
    operator against direct ``zlib.compress`` calls; no SQL oracle by
    construction, so the operator is pytest-covered rather than
    driver-gated."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", docs.schema[id_col].dataType),
            StructField("n_bytes", LongType()),
            StructField("z_bytes", LongType()),
            StructField("ratio_bp", LongType()),
            StructField("flagged", BooleanType()),
        ]
    )
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def run(batches):
        import zlib

        for pdf in batches:
            raw = pdf["t"].fillna("").map(lambda s: s.encode("utf-8"))
            n = raw.map(len)
            z = raw.map(lambda b: len(zlib.compress(b, level)) if b else 0)
            ratio = pd.Series(
                [
                    (int(zz) * 10000) // int(nn) if nn else 0
                    for nn, zz in zip(n, z)
                ],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n.astype("int64"),
                    "z_bytes": z.astype("int64"),
                    "ratio_bp": ratio.astype("int64"),
                    "flagged": (n > 0)
                    & ((ratio < min_bp) | (ratio > max_bp)),
                }
            )

    return src.mapInPandas(run, schema)
