"""Text-analysis queries for the driver gate: language-ID, quality scoring,
token counting, and rolling-hash fingerprinting over the documents table.

The synthetic corpus is label-shuffled same-vocabulary text, so raw language
prediction is uninformative; the language-ID query injects each row's labeled
markers (repeated, so they dominate the natural token counts) and shows the
heuristic recovering the label — the positive path, same philosophy as
suite_dedup's constructed duplicates.

Determinism: all per-row signals are integers (token/marker/regex counts) or
fixed-op-order doubles derived from them; row-level doubles are snapped to
integers (floor(x*1e6+0.5)) BEFORE any cross-row sum, so aggregation order
cannot matter. The language argmax CASE chain and all SQL expressions are
generated from the same Python constants the Spark operators use."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.plans.suite import _t, query

_COPY_OFFSET = 1_000_000

_MARKER_PREFIX = {lang: " ".join(m[:3]) for lang, m in sorted(T.LANG_PROFILES.items())}

# ---------------------------------------------------------------------------
# SQL twins (DuckDB dialect) of operators/text.py building blocks
# ---------------------------------------------------------------------------

_SQL_NORM = "trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"
_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"


def _sql_marker_count(toks: str, markers: list[str]) -> str:
    lst = ", ".join("'" + m + "'" for m in markers)
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def _sql_lang_case(prefix: str = "c_") -> str:
    """The identical argmax chain predicted_language() builds: first lang in
    sorted order wins ties; all-zero → 'und'."""
    langs = sorted(T.LANG_PROFILES)
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"{prefix}{lang} > 0"]
        for j, other in enumerate(langs):
            if j < i:
                conds.append(f"{prefix}{lang} > {prefix}{other}")
            elif j > i:
                conds.append(f"{prefix}{lang} >= {prefix}{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


_SQL_BPE = (
    "coalesce(list_sum(list_transform("
    "regexp_extract_all({norm}, '[a-z]+'), "
    "w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) "
    "+ len(regexp_extract_all({norm}, '[0-9]+')) "
    "+ len(regexp_extract_all({norm}, '[^\\w\\s]'))"
)

_SQL_TOKHASH = "CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT)"
_SQL_FP = (
    f"list_reduce(list_transform({{toks}}, t -> {_SQL_TOKHASH}), "
    f"(acc, t) -> (acc * {T.FP_BASE} + t) % {T.FP_MOD})"
)


def _sql_quality(norm: str, toks: str) -> str:
    """Same op order as operators.text.quality_score (left-assoc additions)."""
    n_tokens = f"len({toks})"
    n_chars = f"length({norm})"
    nt = f"CAST(greatest({n_tokens}, 1) AS DOUBLE)"
    nc = f"CAST(greatest({n_chars}, 1) AS DOUBLE)"
    stop = f"CAST({_sql_marker_count(toks, T.STOPWORDS)} AS DOUBLE) / {nt}"
    long_r = f"CAST(len(list_filter({toks}, t -> length(t) >= 4)) AS DOUBLE) / {nt}"
    punct = f"CAST(len(regexp_extract_all({norm}, '[^\\w\\s]')) AS DOUBLE) / {nc}"
    digit = f"CAST(len(regexp_extract_all({norm}, '[0-9]')) AS DOUBLE) / {nc}"
    length_ok = f"(CASE WHEN {n_tokens} >= 10 AND {n_tokens} <= 100000 THEN 1.0 ELSE 0.0 END)"
    return (
        f"0.3 * {length_ok} "
        f"+ 0.3 * least(({stop}) * 5.0, 1.0) "
        f"+ 0.2 * ({long_r}) "
        f"+ 0.1 * (1.0 - least(({punct}) * 10.0, 1.0)) "
        f"+ 0.1 * (1.0 - least(({digit}) * 10.0, 1.0))"
    )


def _sql_prefix_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN repeat('{p} ', 20) || text"
        for lang, p in _MARKER_PREFIX.items()
    )
    return f"CASE {whens} ELSE text END"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

@query(
    "text_language_id",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, lang, {_sql_prefix_case()} AS text FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               {', '.join(_sql_marker_count(_SQL_TOKS.format(col='text'), m) + f' AS c_{lang}' for lang, m in sorted(T.LANG_PROFILES.items()))}
        FROM injected
    )
    SELECT lang, {_sql_lang_case()} AS predicted, count(*) AS n
    FROM scored
    GROUP BY 1, 2
    ORDER BY lang, predicted
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker language-ID (operators.text.predicted_language): each
    row's labeled markers are injected ×20 so the heuristic must recover the
    label; output is the (label, prediction) confusion table."""
    from payroll_etl_fastapi_spark.operators.expr import floor_parallelism

    docs = floor_parallelism(
        _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    prefix: F.Column = F.col("text")
    for lang, p in _MARKER_PREFIX.items():
        prefix = F.when(
            F.col("lang") == lang, F.concat(F.repeat(F.lit(p + " "), 20), F.col("text"))
        ).otherwise(prefix)
    injected = docs.withColumn("text", prefix).withColumn(
        "toks", T.tokens(F.col("text"))
    )
    return (
        injected.withColumn(
            "predicted", T.predicted_language(F.col("text"), toks=F.col("toks"))
        )
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@query(
    "text_quality_stats",
    oracle=f"""
    WITH q AS (
        SELECT source,
               CAST(floor(({_sql_quality(_SQL_NORM.format(col='text'), _SQL_TOKS.format(col='text'))}) * 1000000 + 0.5) AS BIGINT) AS q6,
               len({_SQL_TOKS.format(col='text')}) AS n_tokens
        FROM documents
    )
    SELECT source,
           count(*)                        AS n_docs,
           CAST(sum(q6) AS BIGINT)         AS quality_total_micro,
           floor(sum(q6) * 1.0 / count(*) + 0.5) / 1000000.0 AS avg_quality,
           CAST(sum(n_tokens) AS BIGINT)   AS total_tokens
    FROM q
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (operators.text.quality_score) rolled up per source.
    Row scores are snapped to integer micro-units before the cross-row sum,
    so aggregation order cannot perturb the result."""
    docs = _t(spark, sf_dir, "documents")
    q6 = F.floor(T.quality_score(F.col("text")) * 1000000 + F.lit(0.5)).cast("long")
    return (
        docs.select("source", q6.alias("q6"), F.size(T.tokens(F.col("text"))).alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("q6").alias("quality_total_micro"),
            (F.floor(F.sum("q6") * 1.0 / F.count(F.lit(1)) + F.lit(0.5)) / 1000000.0).alias(
                "avg_quality"
            ),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )


@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               len({_SQL_TOKS.format(col='text')}) AS n_ws,
               {_SQL_BPE.format(norm=_SQL_NORM.format(col='text'))} AS n_bpe,
               length({_SQL_NORM.format(col='text')}) AS n_chars
        FROM documents
    )
    SELECT lang,
           count(*)        AS n_docs,
           CAST(sum(n_ws) AS BIGINT)    AS ws_tokens,
           CAST(sum(n_bpe) AS BIGINT)   AS bpe_tokens,
           CAST(sum(n_chars) AS BIGINT) AS chars,
           max(n_ws)       AS max_ws_tokens
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish sub-tokens, operators.text.
    bpe_token_count) rolled up per language — pure integer sums."""
    docs = _t(spark, sf_dir, "documents")
    norm = T.normalize_text(F.col("text"))
    return (
        docs.select(
            "lang",
            F.size(T.tokens(F.col("text"))).alias("n_ws"),
            T.bpe_token_count(F.col("text")).alias("n_bpe"),
            F.length(norm).alias("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            F.sum("n_chars").alias("chars"),
            F.max("n_ws").alias("max_ws_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "vocab_top_tokens",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({_SQL_NORM.format(col='text')}, ' ')) AS token
        FROM documents
    )
    SELECT token,
           count(*)                 AS tf,
           count(DISTINCT doc_id)   AS df
    FROM toks
    WHERE token <> ''
    GROUP BY token
    ORDER BY tf DESC, token
    LIMIT 50
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building — the wordcount of training-data prep: term
    frequency + document frequency per token, top-50 by tf (token tiebreak).

    Scale: explode → partial-count map-side → one shuffle on token →
    TakeOrdered for the top-K; df via count(DISTINCT doc_id) rides the same
    aggregate. This is the plan that builds a 10^6-token vocab from 100 TB
    without a global sort."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(50)
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id AS id, text FROM documents
        UNION ALL
        SELECT doc_id + {_COPY_OFFSET} AS id, text FROM documents
    ),
    fp AS (
        SELECT id, {_SQL_FP.format(toks=_SQL_TOKS.format(col='text'))} AS fingerprint
        FROM corpus
    )
    SELECT fingerprint,
           min(id)                                   AS representative,
           count(*)                                  AS n_dups,
           array_to_string(list_sort(list(id)), ',') AS members
    FROM fp
    GROUP BY fingerprint
    HAVING count(*) > 1
    ORDER BY representative
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (operators.text.doc_fingerprint)
    grouping verbatim copies: order-sensitive Karp-Rabin fold, exact integer
    math in both engines."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text")
    )
    fp = corpus.select(
        F.col("doc_id").alias("id"), T.doc_fingerprint(F.col("text")).alias("fingerprint")
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.min("id").alias("representative"),
            F.count(F.lit(1)).alias("n_dups"),
            F.array_join(
                F.transform(F.sort_array(F.collect_list("id")), lambda x: x.cast("string")),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("representative")
    )


@query(
    "text_repetition_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, {_SQL_TOKS.format(col='text')} AS words FROM documents
    ),
    g AS (
        SELECT doc_id, lang,
               CASE WHEN len(words) >= 2
                    THEN list_transform(range(1, len(words)),
                                        i -> words[i] || ' ' || words[i+1])
                    ELSE CAST([] AS VARCHAR[]) END AS g2,
               CASE WHEN len(words) >= 3
                    THEN list_transform(range(1, len(words) - 1),
                                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                    ELSE CAST([] AS VARCHAR[]) END AS g3
        FROM t
    ),
    m AS (
        SELECT doc_id, lang,
               len(g2) AS t2, len(list_distinct(g2)) AS d2,
               len(g3) AS t3, len(list_distinct(g3)) AS d3
        FROM g
    ),
    tc AS (
        SELECT doc_id, gram, count(*) AS c
        FROM (SELECT doc_id, unnest(g2) AS gram FROM g)
        GROUP BY doc_id, gram
    ),
    top AS (SELECT doc_id, max(c) AS top2 FROM tc GROUP BY doc_id),
    p AS (
        SELECT m.doc_id, m.lang,
               CASE WHEN t2 > 0 THEN (t2 - d2) * 10000 // t2 ELSE 0 END AS dup2_bp,
               CASE WHEN t3 > 0 THEN (t3 - d3) * 10000 // t3 ELSE 0 END AS dup3_bp,
               CASE WHEN t2 > 0 THEN coalesce(top2, 0) * 10000 // t2 ELSE 0 END AS top2_bp
        FROM m LEFT JOIN top USING (doc_id)
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN dup2_bp >= {T.REP_DUP2_BP} OR top2_bp >= {T.REP_TOP2_BP}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
           CAST(sum(dup2_bp) AS BIGINT) AS dup2_bp_total,
           CAST(sum(dup3_bp) AS BIGINT) AS dup3_bp_total,
           CAST(sum(top2_bp) AS BIGINT) AS top2_bp_total,
           max(top2_bp) AS max_top2_bp
    FROM p GROUP BY lang ORDER BY lang
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals
    (operators.text.repetition_metrics): duplicate 2-/3-gram fractions and
    most-common-2-gram share, in exact basis points (integer div — no float
    drift), flagged against the corpus-calibrated thresholds and rolled up
    per language.

    Scale shape: the Spark side is a PURE PROJECTION — the most-common-gram
    multiplicity comes from an array-local sort + run-length aggregate()
    scan (operators.text.max_multiplicity), not the explode + double groupBy
    the oracle uses — zero shuffles before the per-lang rollup, so corpus
    cost is one scan regardless of document count."""
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "doc_id", "lang", T.repetition_metrics(F.col("text")).alias("m")
    ).selectExpr(
        "lang",
        "CASE WHEN m.g2_total > 0 THEN (m.g2_total - m.g2_distinct) * 10000 div m.g2_total ELSE 0 END AS dup2_bp",
        "CASE WHEN m.g3_total > 0 THEN (m.g3_total - m.g3_distinct) * 10000 div m.g3_total ELSE 0 END AS dup3_bp",
        "CASE WHEN m.g2_total > 0 THEN m.top2_count * 10000 div m.g2_total ELSE 0 END AS top2_bp",
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("dup2_bp") >= T.REP_DUP2_BP)
                    | (F.col("top2_bp") >= T.REP_TOP2_BP),
                    1,
                ).otherwise(0)
            ).alias("n_repetitive"),
            F.sum("dup2_bp").alias("dup2_bp_total"),
            F.sum("dup3_bp").alias("dup3_bp_total"),
            F.sum("top2_bp").alias("top2_bp_total"),
            F.max("top2_bp").alias("max_top2_bp"),
        )
        .orderBy("lang")
    )


_SQL_NORM_TEXT = _SQL_NORM.format(col="text")


@query(
    "text_lm_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS tok
        FROM documents
        WHERE {_SQL_NORM_TEXT} <> ''
    ),
    vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    tot AS (
        SELECT CAST(sum(cnt) AS DOUBLE) AS n_total,
               CAST(count(*) AS DOUBLE) AS v_size
        FROM vocab
    ),
    per AS (
        SELECT id,
               CAST(floor(-ln((cnt + 1.0) / (n_total + 1.0 * v_size))
                          * 1000000 + 0.5) AS BIGINT) AS nlp_u
        FROM toks JOIN vocab USING (tok) CROSS JOIN tot
    )
    SELECT id AS doc_id,
           count(*) AS n_tokens,
           round(CAST(sum(nlp_u) AS BIGINT) / count(*) / 1000000.0, 6)
               AS avg_neg_log_prob
    FROM per
    GROUP BY id
    ORDER BY doc_id
    """,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (operators.text.unigram_lm_scores,
    snap_micros mode): per-document average negative log-probability under
    the corpus's own add-one-smoothed unigram model — the LM-based quality
    filter signal (rare/garbage tokens score high, common prose low). The
    per-token scores are snapped to integer microunits before the per-doc
    sum, so aggregation order cannot perturb the result and DuckDB replays
    it exactly. NEW in round 4 (registered past the driver window;
    locally oracle-verified at sf0.01 + sf0.1, round-5 rotation
    candidate)."""
    from payroll_etl_fastapi_spark.plans.suite import _r6

    docs = _t(spark, sf_dir, "documents")
    out = T.unigram_lm_scores(docs, "text", "doc_id", alpha=1.0, snap_micros=True)
    return (
        out.select(
            F.col("id").alias("doc_id"),
            "n_tokens",
            _r6(F.col("avg_neg_log_prob")).alias("avg_neg_log_prob"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_bigram_lm",
    oracle=f"""
    WITH tt AS (
        SELECT doc_id AS id, string_split({_SQL_NORM_TEXT}, ' ') AS t
        FROM documents
        WHERE {_SQL_NORM_TEXT} <> ''
    ),
    pairs AS (
        SELECT id, t[i] AS w1, t[i + 1] AS w2
        FROM (
            SELECT id, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM tt WHERE len(t) >= 2
        )
    ),
    big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY w1),
    vs AS (
        SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v_size
        FROM (
            SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS tok
            FROM documents WHERE {_SQL_NORM_TEXT} <> ''
        )
    ),
    per AS (
        SELECT id,
               CAST(floor(-ln((c12 + 1.0) / (c1 + 1.0 * v_size))
                          * 1000000 + 0.5) AS BIGINT) AS nlp_u
        FROM pairs JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vs
    )
    SELECT id AS doc_id,
           count(*) AS n_bigrams,
           round(CAST(sum(nlp_u) AS BIGINT) / count(*) / 1000000.0, 6)
               AS avg_neg_log_prob
    FROM per
    GROUP BY id
    ORDER BY doc_id
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity scoring (operators.text.bigram_lm_scores,
    snap_micros mode): per-document average negative log-probability of
    each token given its PREDECESSOR under the corpus's own add-one
    bigram model — the conditional step past text_lm_score that catches
    word-salad a unigram filter passes (common words, nonsense order →
    unseen transitions → high surprise; the CCNet/KenLM filter signal
    reduced to an exactly-SQL-replayable form). Transition and context
    counts both come from ONE bigram aggregate (contexts derive from the
    transition table, not a second corpus pass); per-pair scores snap to
    integer microunits before the per-doc sum so aggregation order cannot
    perturb the result."""
    from payroll_etl_fastapi_spark.plans.suite import _r6

    docs = _t(spark, sf_dir, "documents")
    out = T.bigram_lm_scores(docs, "text", "doc_id", alpha=1.0, snap_micros=True)
    return (
        out.select(
            F.col("id").alias("doc_id"),
            "n_bigrams",
            _r6(F.col("avg_neg_log_prob")).alias("avg_neg_log_prob"),
        )
        .orderBy("doc_id")
    )


@query(
    "sketch_cms_token_counts",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS tok
        FROM documents
        WHERE {_SQL_NORM_TEXT} <> ''
    ),
    vocab AS (SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY tok),
    top AS (
        SELECT tok, exact_cnt FROM vocab ORDER BY exact_cnt DESC, tok LIMIT 20
    ),
    rows AS (SELECT unnest([0, 1, 2, 3]) AS row),
    cells AS (
        SELECT rows.row,
               CAST(('0x' || substr(md5('cms' || CAST(rows.row AS VARCHAR)
                    || ':' || tok), 1, 7)) AS BIGINT) % 1024 AS bucket
        FROM toks, rows
    ),
    sketch AS (SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY row, bucket),
    probe AS (
        SELECT top.tok, top.exact_cnt, rows.row,
               CAST(('0x' || substr(md5('cms' || CAST(rows.row AS VARCHAR)
                    || ':' || top.tok), 1, 7)) AS BIGINT) % 1024 AS bucket
        FROM top, rows
    )
    SELECT probe.tok AS token,
           CAST(max(probe.exact_cnt) AS BIGINT) AS exact_cnt,
           CAST(min(coalesce(sketch.cnt, 0)) AS BIGINT) AS cms_count
    FROM probe LEFT JOIN sketch USING (row, bucket)
    GROUP BY probe.tok
    ORDER BY exact_cnt DESC, token
    """,
)
def sketch_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators.sketch): build a
    4×1024 md5-salted CMS over every token occurrence, then estimate the
    exact top-20 tokens' counts from the sketch alone — (token, exact_cnt,
    cms_count) with cms_count ≥ exact_cnt by construction. The oracle
    replays the SKETCH itself bit-for-bit (same salted hashes, same
    min-bucket estimate), not just the exact counts — a bucket-assignment
    or merge bug flips the row. The sketch is ≤ depth·width rows total
    regardless of corpus size and merges bucket-wise (operators.sketch.
    cms_merge) — the distributed/streaming heavy-hitters shape. NEW in
    round 4 (past the driver window; locally oracle-verified, round-5
    rotation candidate)."""
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import sketch as SK
    from payroll_etl_fastapi_spark.operators.expr import floor_parallelism

    docs = floor_parallelism(_t(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = vocab.orderBy(F.col("exact_cnt").desc(), F.col("tok")).limit(20)
    cms = SK.cms_build(toks, "tok")
    est = SK.cms_estimate(cms, top, "tok")
    return (
        top.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            F.col("exact_cnt"),
            F.col("cms_count"),
        )
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


def _bpe_oracle(n_merges: int = 12, mode: str = "merges") -> str:
    """SQL re-training of operators.bpe.train_bpe: K chained iterations,
    each a pair-count + argmax + merge-application level. Words ride as
    boundary-wrapped strings ('|t||o||k|'); a merge rewrites '|L||R|' →
    '|LR|' — the restored boundary bars make SQL replace() scan exactly
    like the engine's leftmost-first fold (verified for the adjacent-
    occurrence case '|a||a||a||a|' → '|aa||aa|'). CTEs are MATERIALIZED so
    each level evaluates once despite double references."""
    parts = [
        f"""toks AS (
        SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS tok
        FROM documents
        WHERE {_SQL_NORM_TEXT} <> ''
    ),
    w0 AS MATERIALIZED (
        SELECT regexp_replace(tok, '(.)', '|\\1|', 'g') AS w, count(*) AS n
        FROM toks WHERE regexp_matches(tok, '^[a-z]+$')
        GROUP BY 1
    )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
        SELECT s.t[u.j] AS lhs, s.t[u.j + 1] AS rhs, sum(s.n) AS cnt
        FROM (SELECT string_split(substr(w, 2, length(w) - 2), '||') AS t, n
              FROM w{i - 1}) s
        CROSS JOIN unnest(generate_series(1, len(s.t) - 1)) AS u(j)
        GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
        SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1
    ),
    w{i} AS MATERIALIZED (
        SELECT replace(s.w, '|' || b.lhs || '||' || b.rhs || '|',
                            '|' || b.lhs || b.rhs || '|') AS w, s.n
        FROM w{i - 1} s, b{i} b
    )"""
        )
    if mode == "tokens":
        # the final words table IS the tokenized corpus: explode its
        # subword tokens weighted by word count
        final = f"""
    SELECT u.tok AS token, CAST(sum(w.n) AS BIGINT) AS n_occurrences
    FROM w{n_merges} w,
         unnest(string_split(substr(w.w, 2, length(w.w) - 2), '||')) AS u(tok)
    GROUP BY u.tok
    ORDER BY n_occurrences DESC, token
    LIMIT 20
    """
        return "\n    WITH " + ",\n    ".join(parts) + final
    union = "\n        UNION ALL\n".join(
        f"        SELECT CAST({i} AS BIGINT) AS step, lhs, rhs, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM (\n{union}\n    ) ORDER BY step\n    "
    )


@query("vocab_bpe_merges", oracle=_bpe_oracle())
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training (operators/bpe.py, Sennrich et
    al. 2016): one corpus pass reduces documents to a (word, count) table,
    then 12 merge iterations run on the DISTINCT-WORD table — pair counts
    by grouped sum, argmax with a total tie order, merges applied by a
    JVM-side leftmost-first fold. The returned merge table is the trained
    artifact, and the oracle RE-TRAINS it in SQL end to end — a pair-count,
    tie-break, or merge-application divergence flips the very first
    differing step and cascades. The word table (not the corpus) bounds
    every iteration, the production tokenizer-training shape. NEW in
    round 4 (registered past the tail swap; locally oracle-verified,
    round-5 rotation candidate)."""
    from pyspark.sql import types as T2

    from payroll_etl_fastapi_spark.operators import bpe as B

    docs = _t(spark, sf_dir, "documents")
    merges = B.train_bpe(B.word_counts(docs), 12)
    schema = T2.StructType(
        [
            T2.StructField("step", T2.LongType()),
            T2.StructField("lhs", T2.StringType()),
            T2.StructField("rhs", T2.StringType()),
            T2.StructField("pair_count", T2.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(s, l, r, c) for s, l, r, c in merges], schema
    ).orderBy("step")


@query("vocab_bpe_apply", oracle=_bpe_oracle(mode="tokens"))
def vocab_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization with the trained merges (operators.bpe.apply_merges)
    — the encode half: train the 12-step merge table, re-apply it to the
    word table as one chained fold projection (the merge list is a
    plan-time constant; no iteration jobs), and report the top-20 subword
    tokens by weighted occurrence count. The oracle re-trains AND
    re-tokenizes in SQL — its final words CTE is the tokenized corpus, so
    a single misplaced merge anywhere in the chain changes the token
    histogram and flips the hash. NEW in round 4 (registered past the tail
    swap; locally oracle-verified, round-5 rotation candidate)."""
    from pyspark.sql import functions as F2

    from payroll_etl_fastapi_spark.operators import bpe as B
    from payroll_etl_fastapi_spark.plans.suite import fixture

    docs = _t(spark, sf_dir, "documents")
    words = B.word_counts(docs).localCheckpoint(eager=False)
    # the trained merge table is this gate's INPUT (vocab_bpe_merges is the
    # gate that measures training) — memoized per sf_dir so bench passes
    # don't retrain scaffolding (VERDICT r6 #7)
    merges = fixture(
        sf_dir, "bpe_merges_12", lambda: B.train_bpe(words, 12)
    )
    toks = B.apply_merges(words, merges)
    return (
        toks.select(F2.explode("seq").alias("token"), "n")
        .groupBy("token")
        .agg(F2.sum("n").alias("n_occurrences"))
        .orderBy(F2.col("n_occurrences").desc(), "token")
        .limit(20)
    )


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT {_SQL_TOKS.format(col='text')} AS t FROM documents
        WHERE {_SQL_NORM_TEXT} <> ''
    ),
    ucnt AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(t) AS w FROM toks)
        GROUP BY w
    ),
    tot AS (SELECT sum(c) AS n_total FROM ucnt),
    bcnt AS (
        SELECT w1, w2, count(*) AS c12
        FROM (
            SELECT t[i + 1] AS w1, t[i + 2] AS w2
            FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)
            WHERE len(t) >= 2
        )
        GROUP BY w1, w2
        HAVING count(*) >= 5
    )
    SELECT b.w1, b.w2,
           CAST(b.c12 AS BIGINT) AS c12,
           CAST(u1.c AS BIGINT)  AS c1,
           CAST(u2.c AS BIGINT)  AS c2,
           CAST(floor(ln(CAST(b.c12 * t.n_total AS DOUBLE)
                         / CAST(u1.c * u2.c AS DOUBLE)) * 1000000 + 0.5)
                AS BIGINT)        AS pmi_micro
    FROM bcnt b
    JOIN ucnt u1 ON b.w1 = u1.w
    JOIN ucnt u2 ON b.w2 = u2.w, tot t
    ORDER BY pmi_micro DESC, w1, w2
    LIMIT 30
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (operators.text.
    pmi_collocations) — the word2vec-phrases / NLTK collocation primitive:
    the 30 adjacent bigrams whose joint frequency most beats chance
    (PMI = ln(c12·N / (c1·c2)), min support 5), with exact supporting
    counts. Bigrams are built array-locally (zip of shifted slices — no
    positional self-join); the min-support filter prunes the tail BEFORE
    the two unigram joins; the top-30 is TakeOrderedAndProject. PMI is
    micro-snapped with ONE division of integer-valued doubles, identical
    in both engines, so the oracle replays values AND order exactly.
    NEW in round 4 (post-tail); round-5 rotation candidate."""
    docs = _t(spark, sf_dir, "documents")
    return T.pmi_collocations(docs, "text", "doc_id", min_count=5, top_k=30)


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split({_SQL_NORM.format(col='text')}, ' ')) AS token
        FROM documents
    ),
    counts AS (
        SELECT token, count(*) AS tf
        FROM toks WHERE token <> ''
        GROUP BY token
    ),
    total AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM counts),
    top AS (
        SELECT token, tf FROM counts
        ORDER BY tf DESC, token
        LIMIT 50
    )
    SELECT CAST(row_number() OVER ord AS BIGINT)             AS rank,
           token,
           tf,
           CAST(sum(tf) OVER (ord ROWS UNBOUNDED PRECEDING) AS BIGINT)
               * 10000 // n_total                            AS cum_bp
    FROM top, total
    WINDOW ord AS (ORDER BY tf DESC, token)
    ORDER BY rank
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — for the top-50 tokens by corpus frequency,
    the CUMULATIVE share of all token occurrences they cover, in integral-DIV
    basis points. The Zipf diagnostic of vocab design: how far down the rank
    list a tokenizer must go to cover X% of the stream (the head of this
    curve is what `vocab_top_tokens` lists; this adds the running integral).

    Scale shape: token counting is the wordcount aggregate (map-side
    combine, one shuffle); the top-50 is TakeOrderedAndProject (never a
    global sort of the vocab); the ONLY unpartitioned window runs over the
    already-limited 50-row frame (bounded by construction — allow-listed in
    tests/test_bounded_windows.py), and the corpus total joins in as a
    broadcast one-row frame."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("token")).filter(
        F.col("token") != ""
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    total = counts.agg(F.sum("tf").alias("n_total"))
    top = counts.orderBy(F.col("tf").desc(), "token").limit(50)
    from pyspark.sql import Window

    ord_w = Window.orderBy(F.col("tf").desc(), "token")
    ranked = top.crossJoin(F.broadcast(total)).select(
        F.row_number().over(ord_w).cast("long").alias("rank"),
        "token",
        "tf",
        F.sum("tf")
        .over(ord_w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_tf"),
        "n_total",
    )
    return ranked.select(
        "rank",
        "token",
        "tf",
        F.expr("cum_tf * 10000 DIV n_total").alias("cum_bp"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# WordPiece-style greedy tokenization (round 8)
# ---------------------------------------------------------------------------

_WP_VOCAB = 24
_WP_MAXLEN = 4
_WP_MIN = 2


def _wordpiece_oracle(
    vocab_size: int = _WP_VOCAB, maxlen: int = _WP_MAXLEN, min_count: int = _WP_MIN
) -> str:
    """Replay vocabulary derivation AND the greedy longest-match scan.
    The scan accumulator is STRING-ENCODED ('nextpos:piece piece …'):
    DuckDB's list_reduce loses list-valued struct fields across iterations
    (verified: a {'pos', 'pieces'} accumulator keeps only the last append),
    so the oracle folds the identical recurrence over scalar strings —
    same greedy choices, same pieces, value-exact output."""
    subs = (
        f"flatten(list_transform(generate_series(2, {maxlen}), "
        f"l -> list_transform(generate_series(1, greatest(length(word) - l + 1, 0)), "
        f"i -> substr(word, i, l))))"
    )
    cands = (
        f"[c FOR c IN flatten(list_transform(generate_series(2, {maxlen}), "
        f"l -> list_transform(generate_series(1, greatest(length(word) - l + 1, 0)), "
        f"i -> {{'pos': i, 'len': l, 's': substr(word, i, l)}}))) "
        f"IF list_contains(v, c.s)]"
    )
    best = (
        "greatest(1, list_reduce(list_concat([1], "
        "[c.len FOR c IN cands IF c.pos = CAST(x AS INTEGER)]), "
        "(m, c2) -> greatest(m, c2)))"
    )
    return f"""
    WITH words AS (
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS word
              FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word
    ),
    vocab AS (
        SELECT piece FROM (
            SELECT piece, sum(n) AS c
            FROM (SELECT n, unnest({subs}) AS piece
                  FROM words WHERE length(word) >= 2)
            GROUP BY piece
            HAVING sum(n) >= {min_count}
        )
        ORDER BY c DESC, piece
        LIMIT {vocab_size}
    ),
    varr AS (SELECT list(piece ORDER BY piece) AS v FROM vocab),
    withc AS (
        SELECT word, n, {cands} AS cands FROM words, varr
    ),
    scanned AS (
        SELECT word, n, list_reduce(
            list_concat(['1:'],
                list_transform(generate_series(1, length(word)),
                               i -> CAST(i AS VARCHAR))),
            (acc, x) -> CASE
              WHEN CAST(x AS INTEGER) != CAST(split_part(acc, ':', 1) AS INTEGER)
              THEN acc ELSE
                CAST(CAST(split_part(acc, ':', 1) AS INTEGER) + {best} AS VARCHAR)
                || ':' || split_part(acc, ':', 2)
                || CASE WHEN split_part(acc, ':', 2) = '' THEN '' ELSE ' ' END
                || substr(word, CAST(x AS INTEGER), {best})
            END) AS st
        FROM withc
    ),
    pieces AS (
        SELECT word, n, unnest(string_split(split_part(st, ':', 2), ' ')) AS piece
        FROM scanned
    )
    SELECT piece,
           CAST(sum(n) AS BIGINT) AS total_count,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM pieces
    GROUP BY piece
    ORDER BY piece
    """


@query("vocab_wordpiece_apply", oracle=_wordpiece_oracle())
def vocab_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece-style greedy tokenization (operators.bpe.wordpiece_vocab →
    wordpiece_tokenize) — the OTHER classic subword runtime next to the BPE
    merge replay: a frequency-derived multi-character piece vocabulary
    (top-24 weighted substrings, single characters as the implicit
    fallback) segments every corpus word by repeatedly taking the LONGEST
    matching piece at the current position (BERT's runtime algorithm; the
    greedy choice is pinned even where globally suboptimal). Output: the
    tokenized corpus as per-piece totals (occurrence-weighted count +
    distinct words using the piece) — every greedy decision on every word
    is inside the driver hash. All string/integer logic, no floats. The
    oracle re-derives the vocabulary and folds the identical greedy
    recurrence (string-encoded accumulator — see _wordpiece_oracle);
    candidate probing runs against the BROADCAST two-dozen-string vocab
    array, no join, and the scan is one array-local fold per distinct
    word."""
    from payroll_etl_fastapi_spark.operators import bpe as B

    docs = _t(spark, sf_dir, "documents")
    words = B.word_counts(docs).localCheckpoint(eager=False)
    vocab = B.wordpiece_vocab(
        words, vocab_size=_WP_VOCAB, max_piece_len=_WP_MAXLEN, min_count=_WP_MIN
    )
    tok = B.wordpiece_tokenize(words, vocab, max_piece_len=_WP_MAXLEN)
    return (
        tok.select("word", "n", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.sum("n").cast("long").alias("total_count"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .orderBy("piece")
    )


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (round 9, VERDICT r8 #2) — the third classic subword
# algorithm. Gate params mirror operators.bpe.train_unigram defaults.
# ---------------------------------------------------------------------------

_UG_MAXLEN = 4
_UG_SEED = 40
_UG_MIN = 3
_UG_MULTI = 24
_UG_ROUNDS = 2


def _unigram_oracle(
    maxlen: int = _UG_MAXLEN,
    seed_multi: int = _UG_SEED,
    min_count: int = _UG_MIN,
    vocab_multi: int = _UG_MULTI,
    n_rounds: int = _UG_ROUNDS,
) -> str:
    """RE-TRAIN the unigram-LM end to end in SQL: seed substring counts ->
    micro-snapped -ln(c/total) costs -> n_rounds x (Viterbi dp fold ->
    usage counts -> prune -> add-one re-costs) -> final segmentation
    histogram. The dp accumulator is STRING-ENCODED ('cost:seg|...') —
    DuckDB's list_reduce drops list-valued struct state (the WordPiece
    divergence), so the oracle folds the identical recurrence over scalar
    strings; the struct argmin inside each step compares (cost, -len, seg)
    exactly like the engine's array_min tie order."""
    all_structs = (
        f"flatten(list_transform(generate_series(1, {maxlen}), "
        f"l -> list_transform(generate_series(1, greatest(length(word) - l + 1, 0)), "
        f"i -> {{'pos': i, 'len': l, 's': substr(word, i, l)}})))"
    )
    entry = "string_split(acc, '|')[c.pos]"
    # THIRD documented Spark/DuckDB divergence in the tokenizer family
    # (after sequence(1,0)-descends and list-in-struct accumulator drops):
    # DuckDB 1.0.0 mis-evaluates a STRUCT-list list_reduce nested inside
    # another list_reduce lambda once the outer fold runs over a multi-row
    # table — the same expression returns the right argmin on a 1-row
    # input and a WRONG (higher-cost) one over the full word table
    # (reproduced on 'batch': 9484170 chosen over 9184706). An INT-list
    # inner reduce is fine (the WordPiece oracle uses one); the struct
    # argmin here therefore rides list_sort(...)[1], which is
    # value-identical (same lexicographic (cost, -len, seg) order).
    best = (
        f"list_sort("
        f"[{{'c': CAST(split_part({entry}, ':', 1) AS BIGINT) + c.cost, "
        f"'negl': -c.len, "
        f"'s': CASE WHEN split_part({entry}, ':', 2) = '' "
        f"THEN substr(word, c.pos, c.len) "
        f"ELSE split_part({entry}, ':', 2) || ' ' || substr(word, c.pos, c.len) END}} "
        f"FOR c IN cands IF c.pos + c.len - 1 = CAST(x AS INTEGER)])[1]"
    )
    dp = (
        f"list_reduce("
        f"list_concat(['0:'], list_transform(generate_series(1, length(word)), "
        f"i -> CAST(i AS VARCHAR))), "
        f"(acc, x) -> acc || '|' || "
        f"(CAST(({best}).c AS VARCHAR) || ':' || ({best}).s))"
    )
    cost_expr = (
        "CAST(floor(-ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000.0 "
        "+ 0.5) AS BIGINT)"
    )

    def vlist_cte(name: str, src: str) -> str:
        return (
            f"{name} AS MATERIALIZED (\n"
            f"        SELECT list({{'s': piece, 'cost': {cost_expr}}} ORDER BY piece) AS vl\n"
            f"        FROM {src}, (SELECT sum(c) AS t FROM {src})\n"
            f"    )"
        )

    def seg_ctes(r: int, vname: str) -> str:
        return (
            f"wc{r} AS (\n"
            f"        SELECT word, n,\n"
            f"          [{{'pos': c.pos, 'len': c.len,\n"
            f"             'cost': [v.cost FOR v IN vl IF v.s = c.s][1]}}\n"
            f"           FOR c IN {all_structs}\n"
            f"           IF list_contains([v.s FOR v IN vl], c.s)] AS cands\n"
            f"        FROM words, {vname}\n"
            f"    ),\n"
            f"    seg{r} AS MATERIALIZED (\n"
            f"        SELECT word, n,\n"
            f"          split_part(string_split({dp}, '|')[length(word) + 1], ':', 2) AS seg\n"
            f"        FROM wc{r}\n"
            f"    )"
        )

    parts = [
        f"""words AS MATERIALIZED (
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS word
              FROM documents)
        WHERE regexp_matches(word, '^[a-z]+$')
        GROUP BY word
    ),
    sub0 AS MATERIALIZED (
        SELECT piece, sum(n) AS c
        FROM (SELECT n, unnest(flatten(list_transform(
                  generate_series(1, {maxlen}),
                  l -> list_transform(
                      generate_series(1, greatest(length(word) - l + 1, 0)),
                      i -> substr(word, i, l))))) AS piece
              FROM words)
        GROUP BY piece
    ),
    chars AS (SELECT piece FROM sub0 WHERE length(piece) = 1),
    seed AS MATERIALIZED (
        SELECT piece, c FROM sub0 WHERE length(piece) = 1
        UNION ALL
        SELECT piece, c FROM (
            SELECT piece, c FROM sub0
            WHERE length(piece) > 1 AND c >= {min_count}
            ORDER BY c DESC, piece LIMIT {seed_multi})
    ),
    {vlist_cte("v0", "seed")}"""
    ]
    for r in range(1, n_rounds + 1):
        parts.append(seg_ctes(r, f"v{r - 1}"))
        parts.append(
            f"""use{r} AS MATERIALIZED (
        SELECT piece, sum(n) AS u
        FROM (SELECT n, unnest(string_split(seg, ' ')) AS piece FROM seg{r})
        GROUP BY piece
    ),
    kept{r} AS MATERIALIZED (
        SELECT ch.piece, COALESCE(u.u, 0) + 1 AS c
        FROM chars ch LEFT JOIN use{r} u ON u.piece = ch.piece
        UNION ALL
        SELECT piece, u + 1 AS c FROM (
            SELECT piece, u FROM use{r} WHERE length(piece) > 1
            ORDER BY u DESC, piece LIMIT {vocab_multi})
    ),
    {vlist_cte(f"v{r}", f"kept{r}")}"""
        )
    parts.append(seg_ctes(n_rounds + 1, f"v{n_rounds}"))
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT piece,
           CAST(sum(n) AS BIGINT) AS total_count,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM (SELECT word, n, unnest(string_split(seg, ' ')) AS piece
          FROM seg{n_rounds + 1})
    GROUP BY piece
    ORDER BY piece
    """
    )


@query("vocab_unigram_apply", oracle=_unigram_oracle())
def vocab_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) subword tokenization (operators.bpe
    .train_unigram -> unigram_viterbi_tokenize, Kudo 2018 hard-EM variant)
    — the THIRD classic subword algorithm next to the BPE merge replay and
    WordPiece's greedy scan: a seeded substring vocabulary with
    micro-snapped -ln(c/total) costs, two EM prune rounds (Viterbi-segment
    the distinct-word table, usage-count, keep the top multi-char pieces
    with single characters always retained, re-derive costs from add-one
    usage), then exact minimum-cost Viterbi segmentation as the apply
    half. Output: the tokenized corpus as per-piece totals — every dp
    decision of every round on every word is inside the driver hash. The
    oracle RE-TRAINS all rounds in SQL: the dp fold rides a string-encoded
    accumulator (DuckDB's list_reduce drops list-in-struct state — the
    WordPiece divergence) and every position range carries the
    sequence(1, 0)-descends guard. Costs snap to integer micros before
    any comparison, so the argmin tie order (cost, longer piece,
    segmentation) is total and engine-portable."""
    from payroll_etl_fastapi_spark.operators import bpe as B

    docs = _t(spark, sf_dir, "documents")
    words = B.word_counts(docs).localCheckpoint(eager=False)
    costs = B.train_unigram(
        words,
        vocab_multi=_UG_MULTI,
        seed_multi=_UG_SEED,
        max_piece_len=_UG_MAXLEN,
        min_count=_UG_MIN,
        n_rounds=_UG_ROUNDS,
    )
    tok = B.unigram_viterbi_tokenize(words, costs, max_piece_len=_UG_MAXLEN)
    return (
        tok.select("word", "n", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.sum("n").cast("long").alias("total_count"),
            F.countDistinct("word").cast("long").alias("n_words"),
        )
        .orderBy("piece")
    )
