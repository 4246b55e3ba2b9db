"""Corpus-preparation gate queries: train/val/test splitting, sequence
packing, stratified sampling, PII scrubbing, distinctive terms, and benchmark
decontamination — the post-dedup half of a training-data pipeline, each with
a DuckDB oracle that replays the operator exactly.

Determinism: every assignment (split, sample, pack) derives from content
hashes or integer prefix sums — no RNG, no partition-layout dependence; all
scores are integer arithmetic (div, not /) so cross-engine float drift cannot
exist. PII regexes are the RE2-compatible subset both engines parse
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import corpus as C
from payroll_etl_fastapi_spark.operators import dedup as D
from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.plans.suite import _t, query
from payroll_etl_fastapi_spark.plans.suite_text import _SQL_NORM, _SQL_TOKS

_SQL_H28 = "CAST(('0x' || substr(md5({x}), 1, 7)) AS BIGINT)"

_PACK_BUDGET = 512

_SAMPLE_RATES = {"en": 250, "de": 500, "fr": 1000, "es": 125}

_BENCH_MOD = 97          # every 97th doc seeds the benchmark holdout
_BENCH_OFFSET = 2_000_000
_BENCH_TOKENS = 40       # benchmark docs are 40-token excerpts
_SHINGLE_N = 5
_MIN_COMMON = 3


# ---------------------------------------------------------------------------
# train / val / test split
# ---------------------------------------------------------------------------

@query(
    "corpus_train_val_test",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               md5({_SQL_NORM.format(col='text')}) AS fp,
               len({_SQL_TOKS.format(col='text')}) AS n_tokens
        FROM documents
    ),
    s AS (
        SELECT doc_id, fp, n_tokens,
               CASE WHEN {_SQL_H28.format(x='fp')} % 100 < {C.TRAIN_UPPER} THEN 'train'
                    WHEN {_SQL_H28.format(x='fp')} % 100 < {C.VAL_UPPER} THEN 'val'
                    ELSE 'test' END AS split
        FROM f
    )
    SELECT split,
           count(*)                      AS n_docs,
           count(DISTINCT fp)            AS n_clusters,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id)                   AS min_doc_id
    FROM s
    GROUP BY split
    ORDER BY split
    """,
)
def corpus_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dup-safe train/val/test split (operators.corpus.split_of):
    the bucket is a hash of the CONTENT fingerprint, so duplicates always share
    a split and dedup can never leak eval data into train. Pure projection +
    one tiny rollup — scale-free."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(T.normalize_text(F.col("text")))
    enriched = docs.select(
        "doc_id",
        fp.alias("fp"),
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
    ).withColumn("split", C.split_of(F.col("fp")))
    return (
        enriched.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_clusters"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len({_SQL_TOKS.format(col='text')}) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t
    )
    SELECT CAST((cum - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           count(*)                      AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id)                   AS first_doc,
           max(doc_id)                   AS last_doc
    FROM c
    GROUP BY 1
    ORDER BY pack_id
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (operators.corpus.packed_sequences):
    docs in id order form one token stream; each doc joins the pack holding
    its first token. The oracle is the single-window formulation; the Spark
    plan is the distributed two-level prefix sum (range shuffle + broadcast
    offsets) that survives 100 TB."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(T.tokens(F.col("text"))).alias("n_tokens")
    )
    packed = C.packed_sequences(docs, _PACK_BUDGET)
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("pack_id")
    )


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def _sql_rate_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{s}' THEN {r}" for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"CASE {whens} ELSE 0 END"


@query(
    "corpus_sample_stratified",
    oracle=f"""
    WITH s AS (
        SELECT lang, doc_id,
               len({_SQL_TOKS.format(col='text')}) AS n_tokens,
               ({_SQL_H28.format(x='CAST(doc_id AS VARCHAR)')} % 1000)
                   < ({_sql_rate_case()}) AS keep
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)        AS n_kept,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
           min(CASE WHEN keep THEN doc_id END)                          AS min_kept_id
    FROM s
    GROUP BY lang
    ORDER BY lang
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (operators.corpus.stratified_sample):
    per-language keep rates in ‰ via content-hash buckets — reproducible under
    any partitioning, unlike df.sample. Languages absent from the rate table
    (zh here) are dropped, proving the 0-rate path."""
    docs = _t(spark, sf_dir, "documents")
    keep = C.stratified_sample(
        F.col("doc_id").cast("string"), _SAMPLE_RATES, "lang"
    )
    s = docs.select(
        "lang",
        "doc_id",
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
        keep.alias("keep"),
    )
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.min(F.when(F.col("keep"), F.col("doc_id"))).alias("min_kept_id"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

_SQL_PII_INJECT = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' call 555-0199 ext 42' ELSE '' END"
)


@query(
    "text_scrub_stats",
    oracle=f"""
    WITH injected AS (
        SELECT doc_id, source, {_SQL_PII_INJECT} AS text FROM documents
    ),
    n AS (
        SELECT doc_id, source, {_SQL_NORM.format(col='text')} AS norm FROM injected
    ),
    scrubbed AS (
        SELECT source,
               len(regexp_extract_all(norm, '{C.EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(norm, '{C.PHONE_RE}')) AS n_phones,
               regexp_replace(regexp_replace(norm, '{C.EMAIL_RE}', '<EMAIL>', 'g'),
                              '{C.PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM n
    )
    SELECT source,
           count(*)                        AS n_docs,
           CAST(sum(n_emails) AS BIGINT)   AS emails_redacted,
           CAST(sum(n_phones) AS BIGINT)   AS phones_redacted,
           CAST(sum({_SQL_H28.format(x='clean')}) AS BIGINT) AS scrub_checksum
    FROM scrubbed
    GROUP BY source
    ORDER BY source
    """,
)
def text_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (operators.corpus.scrub_pii): emails and phone numbers
    are injected deterministically (every 7th/11th doc), then redacted; the
    gate checks redaction counts AND an order-free checksum (sum of 28-bit
    hashes) of the scrubbed text, so a single unredacted byte flips the
    result. Pure projections — fused into the scan, no shuffle beyond the
    rollup."""
    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" call 555-0199 ext 42")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    norm = T.normalize_text(F.col("text"))
    n_emails, n_phones = C.pii_counts(norm)
    s = injected.select(
        "source",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        C.scrub_pii(norm).alias("clean"),
    )
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("emails_redacted"),
            F.sum("n_phones").alias("phones_redacted"),
            F.sum(C.h28(F.col("clean"))).alias("scrub_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# distinctive terms (log-free tf-idf)
# ---------------------------------------------------------------------------

@query(
    "corpus_distinctive_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, t AS token FROM (
            SELECT doc_id, lang,
                   unnest({_SQL_TOKS.format(col='text')}) AS t
            FROM documents
        ) WHERE t <> ''
    ),
    lt AS (
        SELECT lang, token,
               count(*)               AS tf,
               count(DISTINCT doc_id) AS df_lang
        FROM toks GROUP BY lang, token
    ),
    d AS (
        SELECT lang, token, tf,
               CAST(sum(df_lang) OVER (PARTITION BY token) AS BIGINT) AS df
        FROM lt
    ),
    s AS (
        SELECT lang, token, tf, df,
               CAST((tf * (SELECT count(*) FROM documents)) // df AS BIGINT) AS score
        FROM d
    )
    SELECT lang, token, tf, df, score,
           CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, token)
                AS BIGINT) AS rank
    FROM s
    QUALIFY rank <= 5
    ORDER BY lang, rank
    """,
)
def corpus_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive-terms extraction: per-language top-5 tokens by the log-free
    tf-idf surrogate ``tf * N div df`` (exact integer arithmetic — a log-based
    score could drift between engines at the 17th digit and flip a rank).

    Scale: one explode + one (lang, token) aggregate; corpus-wide df rides a
    window over the aggregated frame (vocab-sized, not corpus-sized); the
    per-language top-5 is a row_number over ~|vocab| rows per lang. N arrives
    via a broadcast 1-row crossJoin — no driver action."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(T.tokens(F.col("text"))).alias("token")
    ).filter(F.col("token") != "")
    lt = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df_lang"),
    )
    d = lt.withColumn("df", F.sum("df_lang").over(Window.partitionBy("token")))
    n_total = docs.agg(F.count(F.lit(1)).alias("__n"))
    s = d.crossJoin(F.broadcast(n_total)).withColumn(
        "score", F.expr("CAST((tf * __n) div df AS BIGINT)")
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "token")
    return (
        s.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("lang", "token", "tf", "df", "score", "rank")
        .orderBy("lang", "rank")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_SQL_BENCH_SHINGLES = (
    "list_distinct(list_transform("
    f"generate_series(1, greatest(len(toks) - {_SHINGLE_N - 1}, 0)), "
    f"i -> array_to_string(list_slice(toks, i, i + {_SHINGLE_N - 1}), ' ')))"
)


@query(
    "corpus_contamination",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, {_SQL_TOKS.format(col='text')} AS toks FROM documents
    ),
    bench AS (
        SELECT doc_id + {_BENCH_OFFSET} AS bench_id,
               list_slice({_SQL_TOKS.format(col='text')}, 1, {_BENCH_TOKENS}) AS toks
        FROM documents WHERE doc_id % {_BENCH_MOD} = 0
    ),
    cs AS (
        SELECT doc_id, unnest({_SQL_BENCH_SHINGLES}) AS shingle FROM corpus
    ),
    bs AS (
        SELECT bench_id, unnest({_SQL_BENCH_SHINGLES}) AS shingle FROM bench
    ),
    bn AS (
        SELECT bench_id, count(*) AS n_bench_shingles FROM bs GROUP BY bench_id
    ),
    hits AS (
        SELECT cs.doc_id, bs.bench_id, count(*) AS n_common
        FROM cs JOIN bs USING (shingle)
        GROUP BY cs.doc_id, bs.bench_id
    )
    SELECT h.doc_id, h.bench_id,
           CAST(h.n_common AS BIGINT)        AS n_common,
           CAST(bn.n_bench_shingles AS BIGINT) AS n_bench_shingles,
           CAST((h.n_common * 10000) // bn.n_bench_shingles AS BIGINT) AS overlap_bp
    FROM hits h JOIN bn USING (bench_id)
    WHERE h.n_common >= {_MIN_COMMON}
    ORDER BY doc_id, bench_id
    """,
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 5-gram shingle overlap between the corpus
    and a deterministic benchmark holdout (40-token excerpts of every 97th
    doc). A corpus doc containing a benchmark excerpt surfaces with
    overlap_bp ≈ 10000 (basis points, integer div).

    Scale: candidates come from an equality join on shingle strings — the
    benchmark side is tiny (eval sets are ~10^3-10^5 docs) so Spark
    broadcasts it; the corpus side streams through map-side. No all-pairs
    comparison exists anywhere in the plan."""
    docs = _t(spark, sf_dir, "documents")
    corpus_sh = D.shingles(docs, "text", "doc_id", n=_SHINGLE_N).withColumnRenamed(
        "id", "doc_id"
    )
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        (F.col("doc_id") + _BENCH_OFFSET).alias("bench_id"),
        F.array_join(F.slice(T.tokens(F.col("text")), 1, _BENCH_TOKENS), " ").alias(
            "text"
        ),
    )
    bench_sh = D.shingles(bench, "text", "bench_id", n=_SHINGLE_N).withColumnRenamed(
        "id", "bench_id"
    )
    bn = bench_sh.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench_shingles")
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _MIN_COMMON)
    )
    return (
        hits.join(F.broadcast(bn), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            "n_common",
            "n_bench_shingles",
            F.expr("CAST((n_common * 10000) div n_bench_shingles AS BIGINT)").alias(
                "overlap_bp"
            ),
        )
        .orderBy("doc_id", "bench_id")
    )


# ---------------------------------------------------------------------------
# passage-level (chunk) boilerplate scrub
# ---------------------------------------------------------------------------

_CHUNK_WORDS = 10
_BOILER_MIN_DOCS = 2


@query(
    "corpus_passage_scrub",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               string_split({_SQL_NORM.format(col='text')}, ' ') AS words
        FROM documents
    ),
    c AS (
        SELECT doc_id, source,
               CAST(unnest(range(CAST(ceil(len(words) / {_CHUNK_WORDS}.0) AS BIGINT))) AS INT) AS chunk_idx,
               words
        FROM w
    ),
    c2 AS (
        SELECT doc_id, source, chunk_idx,
               array_to_string(
                   words[(chunk_idx*{_CHUNK_WORDS}+1):(chunk_idx*{_CHUNK_WORDS}+{_CHUNK_WORDS})],
                   ' ') AS chunk
        FROM c
    ),
    boiler AS (
        SELECT chunk FROM c2
        GROUP BY chunk HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
    ),
    kept AS (
        SELECT * FROM c2 WHERE chunk NOT IN (SELECT chunk FROM boiler)
    ),
    r AS (
        SELECT doc_id, count(*) AS n_kept,
               array_to_string(list(chunk ORDER BY chunk_idx), ' ') AS cleaned_text
        FROM kept GROUP BY doc_id
    ),
    tot AS (
        SELECT doc_id, source, count(*) AS n_chunks FROM c2 GROUP BY doc_id, source
    )
    SELECT t.source,
           count(*) AS n_docs,
           CAST(sum(t.n_chunks) AS BIGINT)           AS total_chunks,
           CAST(sum(coalesce(r.n_kept, 0)) AS BIGINT) AS kept_chunks,
           CAST(sum({_SQL_H28.format(x="coalesce(r.cleaned_text, '')")}) AS BIGINT)
               AS clean_checksum
    FROM tot t LEFT JOIN r USING (doc_id)
    GROUP BY t.source ORDER BY t.source
    """,
)
def corpus_passage_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level boilerplate scrub (operators.passage.scrub_common_passages):
    every {_CHUNK_WORDS}-word chunk appearing in >= {_BOILER_MIN_DOCS} distinct
    documents is removed and survivors are reassembled in document order — the
    C4/RefinedWeb "drop lines repeated across documents" step over fixed word
    windows (the synthetic corpus has no newlines to anchor on). The gate rolls
    up per source and checksums every reassembled text (order-free h28 sum), so
    one wrongly kept or dropped chunk — or a reassembly order bug — flips the
    result.

    Scale: one posexplode (~n_chunks rows/doc), one grouped count at
    distinct-chunk granularity (map-side combine), one anti-join back on the
    pre-shrunk boilerplate set (broadcast at realistic thresholds), one
    groupBy doc_id to reassemble. All built-in expressions, no UDF."""
    from payroll_etl_fastapi_spark.operators import passage as P

    docs = _t(spark, sf_dir, "documents")
    scrubbed = P.scrub_common_passages(
        docs, chunk_words=_CHUNK_WORDS, min_docs=_BOILER_MIN_DOCS
    )
    return (
        scrubbed.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("total_chunks"),
            F.sum("n_kept").alias("kept_chunks"),
            F.sum(C.h28(F.col("cleaned_text"))).alias("clean_checksum"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection)
# ---------------------------------------------------------------------------

_DSIR_B = C.DSIR_BUCKETS


@query(
    "corpus_dsir_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, lang = 'en' AS tgt, unnest({_SQL_TOKS.format(col='text')}) AS tok
        FROM documents
        WHERE {_SQL_NORM.format(col='text')} <> ''
    ),
    b AS (
        SELECT id, tgt,
               {_SQL_H28.format(x="'dsir:' || tok")} % {_DSIR_B} AS bucket
        FROM toks
    ),
    stats AS (
        SELECT bucket, count(*) AS raw_cnt,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_cnt
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(raw_cnt) AS n_raw, sum(tgt_cnt) AS n_tgt FROM stats),
    r AS (
        SELECT bucket,
               CAST(floor((ln((tgt_cnt + 1.0) / (n_tgt + 1.0 * {_DSIR_B}))
                         - ln((raw_cnt + 1.0) / (n_raw + 1.0 * {_DSIR_B})))
                         * 1000000 + 0.5) AS BIGINT) AS micro
        FROM stats, tot
    ),
    per AS (
        SELECT b.id, count(*) AS n_tokens, sum(r.micro) AS s
        FROM b JOIN r USING (bucket) GROUP BY b.id
    )
    SELECT id AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           s / 1000000.0            AS log_weight
    FROM per ORDER BY doc_id
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators.corpus.dsir_log_weights; Xie et al.
    2023): importance weight of every document toward the English subset as
    the target distribution — Σ over tokens of the add-one-smoothed
    log-ratio between target and raw hashed-unigram bucket probabilities.
    Docs that look like the target score high; resampling by these weights
    is the published pretraining-data selection recipe.

    Bucket log-ratios are micro-snapped before the per-doc sum, so the
    oracle replays feature hashing, both distributions, and every weight
    exactly. Plan: one explode pass, one bucket-keyed count (<= 4096 rows
    total — broadcast back), one per-doc sum. NEW in round 4 (post-tail)."""
    docs = _t(spark, sf_dir, "documents")
    out = C.dsir_log_weights(docs, F.col("lang") == "en", "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "log_weight"
    ).orderBy("doc_id")


_DSIR_K = 100


@query(
    "corpus_dsir_resample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id AS id, lang = 'en' AS tgt, unnest({_SQL_TOKS.format(col='text')}) AS tok
        FROM documents
        WHERE {_SQL_NORM.format(col='text')} <> ''
    ),
    b AS (
        SELECT id, tgt,
               {_SQL_H28.format(x="'dsir:' || tok")} % {_DSIR_B} AS bucket
        FROM toks
    ),
    stats AS (
        SELECT bucket, count(*) AS raw_cnt,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tgt_cnt
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT sum(raw_cnt) AS n_raw, sum(tgt_cnt) AS n_tgt FROM stats),
    r AS (
        SELECT bucket,
               CAST(floor((ln((tgt_cnt + 1.0) / (n_tgt + 1.0 * {_DSIR_B}))
                         - ln((raw_cnt + 1.0) / (n_raw + 1.0 * {_DSIR_B})))
                         * 1000000 + 0.5) AS BIGINT) AS micro
        FROM stats, tot
    ),
    per AS (
        SELECT b.id, count(*) AS n_tokens, sum(r.micro) AS s
        FROM b JOIN r USING (bucket) GROUP BY b.id
    ),
    g AS (
        SELECT id, n_tokens, s,
               ({_SQL_H28.format(x="'gumbel:' || CAST(id AS VARCHAR)")} + 1)
                   / 268435457.0 AS u
        FROM per
    )
    SELECT id AS doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           s / 1000000.0            AS log_weight,
           (s + CAST(floor((-ln(-ln(u))) * 1000000 + 0.5) AS BIGINT))
               / 1000000.0          AS score
    FROM g
    ORDER BY score DESC, doc_id
    LIMIT {_DSIR_K}
    """,
)
def corpus_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DSIR recipe end to end (operators.corpus.dsir_resample; Xie
    et al. 2023): importance weights toward the English subset, then
    Gumbel-top-k resampling — sampling without replacement proportional to
    softmax'd weights IS "top k by weight + Gumbel noise" (Gumbel-max
    trick), executed as one TakeOrderedAndProject over the weight frame.
    The Gumbel draws are md5-hash-derived (deterministic per doc — task
    retries on a cluster re-derive identical samples, where rand() silently
    would not), and the selection order is a total integer-micro order, so
    the oracle replays weighting, noise, and the exact selected set.
    NEW in round 4 (post-tail); round-5 rotation candidate."""
    docs = _t(spark, sf_dir, "documents")
    out = C.dsir_resample(docs, F.col("lang") == "en", _DSIR_K, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "log_weight", "score"
    )


# ---------------------------------------------------------------------------
# near-dup-cluster-aware split (leakage-safe across LSH clusters)
# ---------------------------------------------------------------------------

def _cluster_split_oracle() -> str:
    from payroll_etl_fastapi_spark.plans import suite_dedup as SD

    split_case = (
        f"CASE WHEN {_SQL_H28.format(x='md5(CAST(comp AS VARCHAR))')} % 100"
        f" < {C.TRAIN_UPPER} THEN 'train'"
        f" WHEN {_SQL_H28.format(x='md5(CAST(comp AS VARCHAR))')} % 100"
        f" < {C.VAL_UPPER} THEN 'val' ELSE 'test' END"
    )
    return f"""
    WITH RECURSIVE {SD._sql_corpus(mutated=True)},
    {SD._SQL_SHINGLES},
    {SD._minhash_pairs_ctes()},
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM vpairs
        UNION
        SELECT id_b, id_a FROM vpairs
    ),
    walk(id, label) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.id
    ),
    compmap AS (SELECT id, min(label) AS comp FROM walk GROUP BY id),
    assign AS (
        SELECT c.id, coalesce(m.comp, c.id) AS comp
        FROM corpus c LEFT JOIN compmap m ON m.id = c.id
    ),
    spl AS (SELECT id, comp, {split_case} AS split FROM assign),
    leak AS (
        SELECT CAST(count(*) AS BIGINT) AS leaked_clusters FROM (
            SELECT comp FROM spl GROUP BY comp
            HAVING count(DISTINCT split) > 1
        )
    )
    SELECT split,
           count(*)               AS n_docs,
           count(DISTINCT comp)   AS n_clusters,
           (SELECT leaked_clusters FROM leak) AS leaked_clusters
    FROM spl
    GROUP BY split
    ORDER BY split
    """


@query("corpus_cluster_split", oracle=_cluster_split_oracle())
def corpus_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup-cluster-aware train/val/test split: the full leakage-safe
    pipeline — MinHash-LSH banded candidates, candidate-restricted exact
    Jaccard verify (counts mode), connected components over the verified
    pairs, then split assignment hashed from the CLUSTER representative —
    so a document and all its near-duplicates (even chained A~B~C) land in
    the same split. ``corpus_train_val_test`` is only EXACT-dup-safe (its
    fingerprint is the content hash); this closes the gap that near-dup
    survivors of different spellings leak eval content into train — the
    benchmark-contamination failure mode of real LLM training corpora.

    Output rows per split carry a driver-verified ``leaked_clusters``
    column (clusters spanning >1 split) that must be 0 by construction —
    the leakage guarantee itself is part of the gate hash, and the oracle
    recomputes pairs, components (recursive CTE), assignment, and the
    audit from scratch.

    Scale shape (100 TB): candidates are banded equality joins (never
    all-pairs), verify touches candidates only, components run one job per
    iteration on the PAIR list (tiny vs corpus), and the final assignment
    is a LEFT join of the corpus against the component map (near-dup
    clusters are a small fraction of docs) + a pure-projection split hash.
    Identical plan family to dedup_ngram_jaccard + dedup_connected_
    components, composed end-to-end."""
    from payroll_etl_fastapi_spark.plans import suite_dedup as SD

    corpus = SD._spark_corpus(spark, sf_dir, mutated=True)
    pairs = D.minhash_verified_pairs(
        corpus, "text", "doc_id", n=3, num_hashes=16, bands=4, threshold=0.5,
        verify_via="counts",
    )
    cc = D.connected_components(pairs.select("id_a", "id_b"))
    assign = (
        corpus.select(F.col("doc_id").alias("id"))
        .join(cc.withColumnRenamed("component", "comp"), "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("cluster"))
    )
    # split_of hashes its argument, which by family convention is an md5
    # fingerprint — here the cluster representative's id rendered through
    # md5, matching the oracle's md5(CAST(comp AS VARCHAR))
    spl = assign.withColumn(
        "split", C.split_of(F.md5(F.col("cluster").cast("string")))
    )
    # ONE pass over the corpus-sized frame (round 13): the leak audit and
    # the per-split rollup both reduce to the tiny (cluster, split, n)
    # grouped frame — (cluster, split) is unique there, so rows-per-cluster
    # IS countDistinct(split) and rows-per-split IS countDistinct(cluster).
    # The old shape ran the corpus scan + mutation union + component join
    # once per consumer. Lazy checkpoint: both aggregates are separate
    # actions on the same grouped frame. Values bit-identical (exact
    # integer counts either way).
    g = (
        spl.groupBy("cluster", "split")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    leak = (
        g.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("ns"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("ns") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("leaked_clusters")
        )
    )
    return (
        g.groupBy("split")
        .agg(
            F.sum("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# temperature-based source mixing
# ---------------------------------------------------------------------------

@query(
    "corpus_temperature_mix",
    oracle="""
    WITH per AS (
        SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT stratum, n_docs,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS weight_micro
        FROM per
    ),
    tot AS (
        SELECT CAST(sum(weight_micro) AS BIGINT) AS tot_w,
               CAST(sum(n_docs) AS BIGINT) AS tot_n
        FROM w
    )
    SELECT stratum, n_docs, weight_micro,
           weight_micro * 10000 // tot_w AS share_bp,
           (weight_micro * 10000 // tot_w) * 1000000
               // nullif(n_docs * 1000000 // tot_n, 0) AS boost_bp
    FROM w, tot
    ORDER BY stratum
    """,
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture shares across document sources
    (operators.corpus.temperature_shares): p_s ∝ n_s^(1/2), the
    multilingual/source resampling recipe that up-weights minority slices.
    α = 1/2 is the bit-portable temperature (sqrt is IEEE correctly-rounded
    in both engines; an arbitrary pow exponent is not); per-stratum sqrts
    snap to integer micros BEFORE the total so the sum commutes, and every
    share/boost is integral DIV — the oracle replays the arithmetic
    bit-for-bit. One grouped count + one broadcast one-row total join;
    strata stay dimension-sized at any corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    return C.temperature_shares(docs, "source").orderBy("stratum")


# ---------------------------------------------------------------------------
# deterministic shuffle-shard export layout (round 8)
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 8
_SHUF_SEED = 7
_SHUF_MOD = 1_000_003  # order-checksum modulus (prime, keeps terms small)


@query(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id AS id,
               md5('{_SHUF_SEED}:' || CAST(doc_id AS VARCHAR)) AS skey
        FROM documents
    ),
    sharded AS (
        SELECT id, skey,
               CAST(CAST(('0x' || substr(skey, 1, 7)) AS BIGINT) % {_SHUF_SHARDS}
                    AS INTEGER) AS shard
        FROM keyed
    ),
    pos AS (
        SELECT id, skey, shard,
               row_number() OVER (PARTITION BY shard ORDER BY skey, id) - 1 AS pos
        FROM sharded
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(CASE WHEN pos = 0 THEN id END) AS first_doc,
           CAST(sum((pos + 1) *
                ({_SQL_H28.format(x='CAST(id AS VARCHAR)')} % {_SHUF_MOD}))
                AS BIGINT) AS order_checksum
    FROM pos
    GROUP BY shard
    ORDER BY shard
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard export layout (operators.corpus
    .shuffle_shards): the tfrecord/WebDataset step — every doc's shard and
    within-shard position derive only from (seed, doc_id) via md5, so the
    training order is reproducible on any cluster size and a new seed draws
    a fresh permutation. The gate emits per-shard (n_docs, the doc at
    position 0, and a POSITION-WEIGHTED integer checksum of id hashes), so
    the hash pins the complete shuffle order, not just the membership —
    any perturbation of the permutation flips a row. The oracle replays
    keying, 28-bit shard assignment, the (key, id) rank, and the weighted
    checksum."""
    docs = _t(spark, sf_dir, "documents")
    out = C.shuffle_shards(docs, n_shards=_SHUF_SHARDS, seed=_SHUF_SEED)
    return (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(F.when(F.col("pos") == 0, F.col("id"))).alias("first_doc"),
            F.sum(
                (F.col("pos") + 1)
                * (C.h28(F.col("id").cast("string")) % _SHUF_MOD)
            )
            .cast("long")
            .alias("order_checksum"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# overlapping-chunk retrieval prep (round 8)
# ---------------------------------------------------------------------------

_CHUNK_W = 64
_CHUNK_S = 48
_CHUNK_MOD = 17  # gate slices every 17th doc to keep rows bounded at sf0.1


@query(
    "corpus_chunk_overlap",
    oracle=f"""
    WITH tt AS (
        SELECT doc_id AS id, string_split({_SQL_NORM.format(col='text')}, ' ') AS t
        FROM documents
        WHERE doc_id % {_CHUNK_MOD} = 3 AND {_SQL_NORM.format(col='text')} <> ''
    ),
    nc AS (
        SELECT id, t,
               CASE WHEN len(t) <= {_CHUNK_W} THEN 1
                    ELSE 1 + (len(t) - {_CHUNK_W} + {_CHUNK_S - 1}) // {_CHUNK_S}
               END AS n_chunks
        FROM tt
    ),
    chunks AS (
        SELECT id, CAST(c AS BIGINT) AS chunk_id,
               array_to_string(
                   list_slice(t, c * {_CHUNK_S} + 1,
                              c * {_CHUNK_S} + {_CHUNK_W}), ' ') AS chunk_text,
               CAST(least(len(t) - c * {_CHUNK_S}, {_CHUNK_W}) AS BIGINT)
                   AS n_tokens
        FROM (
            SELECT id, t, unnest(generate_series(0, n_chunks - 1)) AS c
            FROM nc
        )
    )
    SELECT id AS doc_id, chunk_id, chunk_text, n_tokens
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking (operators.corpus.chunk_documents,
    64-token windows at stride 48 — 16-token overlap): the RAG/passage
    retrieval prep step; overlap guarantees no passage straddling a
    boundary is ever split across retrieval units, full coverage with an
    integer-exact chunk count (1 + ceil((n − w) / s)), last chunk may run
    short. The gate slices every 17th doc and hashes the chunk TEXT
    verbatim, so window placement, overlap, the short-doc single-chunk
    path, and the short last chunk are all inside the driver hash.
    Array-local build — one projection + explode, no shuffle."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % _CHUNK_MOD == 3
    )
    out = C.chunk_documents(docs, chunk_tokens=_CHUNK_W, stride=_CHUNK_S)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_id", "chunk_text", "n_tokens"
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# deterministic weighted sampling (round 10)
# ---------------------------------------------------------------------------

_WS_N = 50


def _weighted_sample_oracle(n: int = _WS_N, seed: int = 0) -> str:
    """SQL twin of corpus_weighted_sample: replay the hash-derived uniform,
    the exponential-race score (-ln(u)/w, micro-snapped — the unigram-cost
    ln precedent), and the (score, id) top-n ranking."""
    h = _SQL_H28.format(x=f"'ws{seed}:' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH scored AS (
        SELECT doc_id AS id,
               CAST(floor(CAST(n_chars AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   AS weight_micro,
               CAST(floor((-ln(({h} + 1) / 268435456.0)
                           / CAST(n_chars AS DOUBLE)) * 1000000 + 0.5)
                    AS BIGINT) AS score_micro
        FROM documents
        WHERE n_chars > 0
    ),
    ranked AS (
        SELECT id, weight_micro, score_micro,
               CAST(row_number() OVER (ORDER BY score_micro, id) AS INTEGER)
                   AS rank
        FROM scored
    )
    SELECT id, weight_micro, score_micro, rank
    FROM ranked WHERE rank <= {n}
    ORDER BY rank
    """


@query("corpus_weighted_sample", oracle=_weighted_sample_oracle())
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (corpus.weighted_sample, Efraimidis-Spirakis exponential race over
    hash-derived uniforms) — "take the top-N docs proportional to a
    quality weight" in ONE scan: a narrow projection (hash + ln per row)
    into a global TakeOrderedAndProject top-n (plan-asserted in
    tests/test_corpus.py), never a corpus-wide window or shuffle. The
    weight here is n_chars (length-proportional subsampling); the oracle
    replays uniform, score snap, and the total (score, id) ranking. No
    reference counterpart (/root/reference samples nothing); the operator
    is the weighted complement of the stratified content-hash sampler
    (corpus_sample_stratified)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return C.weighted_sample(docs, _WS_N, F.col("n_chars")).orderBy("rank")
