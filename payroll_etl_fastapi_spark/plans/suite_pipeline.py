"""Composite training-data pipeline query: the extension operators composed
the way a real corpus-preparation job runs them — quality scoring → language
gate → exact dedup → per-language yield stats — in ONE DataFrame plan, with a
DuckDB oracle replaying every stage.

This is the integration proof for the operator families: each stage's
determinism contract (integer signals, micro-unit snapping, md5 fingerprints)
composes, so the whole pipeline stays oracle-exact.

Scale shape: stages 1-2 are per-row projections fused into the scan (no
shuffle); the dedup groupBy is the first exchange, keyed on the md5
fingerprint (uniform); the final rollup is a second, tiny exchange. A 100 TB
corpus flows through exactly two shuffles, the first of which AQE can
coalesce aggressively because the fingerprint distribution is uniform."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.plans.suite import _t, query
from payroll_etl_fastapi_spark.plans.suite_text import (
    _SQL_NORM,
    _SQL_TOKS,
    _sql_quality,
)

_QUALITY_MIN = 0.55


@query(
    "pipeline_training_data",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, source, text,
               md5({_SQL_NORM.format(col='text')}) AS fingerprint,
               len({_SQL_TOKS.format(col='text')}) AS n_tokens,
               CAST(floor(({_sql_quality(_SQL_NORM.format(col='text'), _SQL_TOKS.format(col='text'))}) * 1000000 + 0.5) AS BIGINT) AS q6
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored WHERE q6 >= {int(_QUALITY_MIN * 1000000)} AND lang IN ('en', 'de', 'fr')
    ),
    deduped AS (
        SELECT * FROM kept
        QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
    )
    SELECT lang,
           count(*)        AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(q6) AS BIGINT)       AS quality_total_micro,
           min(doc_id)     AS min_doc_id
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
)
def pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-prep pipeline: quality gate (≥ 0.55 micro-snapped), language
    allowlist, exact-dedup keep-lowest-id, per-language yield stats. One plan,
    two shuffles (fingerprint dedup, language rollup)."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        F.md5(T.normalize_text(F.col("text"))).alias("fingerprint"),
        F.size(T.tokens(F.col("text"))).alias("n_tokens"),
        F.floor(T.quality_score(F.col("text")) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("q6"),
    )
    kept = scored.filter(
        (F.col("q6") >= int(_QUALITY_MIN * 1000000))
        & F.col("lang").isin("en", "de", "fr")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("q6").alias("quality_total_micro"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# pipeline v2 (round 8): the session's new operators composed end to end —
# bigram-LM perplexity gate → cross-doc duplicated-span removal → overlapping
# chunking → deterministic shuffle-shard layout, ONE plan, one oracle.
# ---------------------------------------------------------------------------

V2_BLM_MAX = 3.395   # keep docs at/below the corpus-stable median surprise
V2_W, V2_S = 64, 48  # chunk window/stride
V2_SHARDS = 8
V2_SEED = 7
V2_KEY_MULT = 1000   # chunk_key = doc_id * 1000 + chunk_id (chunks/doc << 1000)
V2_CHECK_MOD = 1_000_003

_SQL_NORM_TEXT = _SQL_NORM.format(col="text")


def _pipeline_v2_oracle() -> str:
    w, s = V2_W, V2_S
    sw = 8  # span-removal window (dedup_span_removal's granularity)
    return f"""
    WITH tt AS (
        SELECT doc_id AS id, string_split({_SQL_NORM_TEXT}, ' ') AS t
        FROM documents WHERE {_SQL_NORM_TEXT} <> ''
    ),
    prs AS (
        SELECT id, t[i] AS w1, t[i + 1] AS w2
        FROM (SELECT id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM tt WHERE len(t) >= 2)
    ),
    big AS (SELECT w1, w2, count(*) AS c12 FROM prs GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c12) AS c1 FROM big GROUP BY w1),
    vs AS (
        SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v_size
        FROM (SELECT unnest(string_split({_SQL_NORM_TEXT}, ' ')) AS tok
              FROM documents WHERE {_SQL_NORM_TEXT} <> '')
    ),
    lm AS (
        SELECT id,
               CAST(sum(CAST(floor(-ln((c12 + 1.0) / (c1 + 1.0 * v_size))
                                   * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                   / count(*) / 1000000.0 AS blm
        FROM prs JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vs
        GROUP BY id
    ),
    kept AS (
        SELECT d.doc_id AS id, d.text
        FROM documents d JOIN lm ON d.doc_id = lm.id
        WHERE lm.blm <= {V2_BLM_MAX}
    ),
    ktoks AS (SELECT id, string_split({_SQL_NORM_TEXT}, ' ') AS t FROM kept),
    kbase AS (
        SELECT id,
               array_to_string(
                   list_slice(t, (len(t) // {sw}) * {sw} + 1, len(t)), ' ') AS tail
        FROM ktoks
    ),
    ksp AS (
        SELECT id, i AS pos,
               array_to_string(list_slice(t, i * {sw} + 1, i * {sw} + {sw}), ' ') AS span
        FROM ktoks, unnest(
            CASE WHEN len(t) >= {sw}
                 THEN generate_series(0, len(t) // {sw} - 1)
                 ELSE [] END) AS u(i)
    ),
    kfp AS (SELECT id, pos, md5(span) AS fp, span FROM ksp),
    kcnt AS (
        SELECT fp, count(DISTINCT id) AS n_docs, min(id) AS first_id
        FROM kfp GROUP BY fp
    ),
    kkept AS (
        SELECT f.id, f.pos, f.span
        FROM kfp f JOIN kcnt c USING (fp)
        WHERE NOT (c.n_docs >= 2 AND f.id <> c.first_id)
    ),
    rebuilt AS (
        SELECT id, string_agg(span, ' ' ORDER BY pos) AS body
        FROM kkept GROUP BY id
    ),
    cleaned AS (
        SELECT b.id,
               concat_ws(' ', nullif(coalesce(r.body, ''), ''),
                         nullif(b.tail, '')) AS text
        FROM kbase b LEFT JOIN rebuilt r USING (id)
    ),
    ctoks AS (
        SELECT id, string_split({_SQL_NORM_TEXT}, ' ') AS t
        FROM cleaned WHERE {_SQL_NORM_TEXT} <> ''
    ),
    nc AS (
        SELECT id, t,
               CASE WHEN len(t) <= {w} THEN 1
                    ELSE 1 + (len(t) - {w} + {s - 1}) // {s} END AS n_chunks
        FROM ctoks
    ),
    chunks AS (
        SELECT id * {V2_KEY_MULT} + c AS chunk_key,
               CAST(least(len(t) - c * {s}, {w}) AS BIGINT) AS n_tokens
        FROM (SELECT id, t, unnest(generate_series(0, n_chunks - 1)) AS c FROM nc)
    ),
    sharded AS (
        SELECT chunk_key, n_tokens,
               md5('{V2_SEED}:' || CAST(chunk_key AS VARCHAR)) AS skey
        FROM chunks
    ),
    placed AS (
        SELECT chunk_key, n_tokens, skey,
               CAST(CAST(('0x' || substr(skey, 1, 7)) AS BIGINT) % {V2_SHARDS}
                    AS INTEGER) AS shard
        FROM sharded
    ),
    pos AS (
        SELECT *, row_number() OVER (PARTITION BY shard ORDER BY skey, chunk_key)
                  - 1 AS pos
        FROM placed
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(CASE WHEN pos = 0 THEN chunk_key END) AS first_chunk,
           CAST(sum((pos + 1) *
                (CAST(('0x' || substr(md5(CAST(chunk_key AS VARCHAR)), 1, 7))
                      AS BIGINT) % {V2_CHECK_MOD})) AS BIGINT) AS order_checksum
    FROM pos
    GROUP BY shard
    ORDER BY shard
    """


@query("pipeline_training_data_v2", oracle=_pipeline_v2_oracle())
def pipeline_training_data_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 corpus-prep operators composed the way a production job
    chains them, in ONE DataFrame plan with one end-to-end oracle:

    1. bigram-LM perplexity gate (text.bigram_lm_scores, snap_micros) —
       keep docs at/below {V2_BLM_MAX} mean surprise (the corpus-stable
       median; word-salad scores high);
    2. cross-document duplicated-span removal over the SURVIVORS
       (dedup.remove_duplicate_spans, keep_first) — boilerplate cut, one
       canonical copy kept;
    3. overlapping 64/48 chunking of the CLEANED text
       (corpus.chunk_documents) — retrieval/training units;
    4. deterministic shuffle-shard layout of the chunks
       (corpus.shuffle_shards on chunk_key = doc_id*1000 + chunk_id).

    Output: per-shard (n_chunks, total_tokens, position-0 chunk, position-
    weighted order checksum) — the hash pins the complete composed
    pipeline: a drift in ANY stage (LM counts, span verdicts, window
    placement, shard permutation) flips a row. Scale shape: the stages
    compose linearly — bigram/span passes are digest/bigram-keyed
    shuffles, chunking is array-local, the shard layout is one exchange;
    no stage materializes to the driver."""
    from payroll_etl_fastapi_spark.operators import corpus as C
    from payroll_etl_fastapi_spark.operators import dedup as D2

    docs = _t(spark, sf_dir, "documents")
    lm = T.bigram_lm_scores(docs, "text", "doc_id", alpha=1.0, snap_micros=True)
    kept = docs.join(
        lm.filter(F.col("avg_neg_log_prob") <= V2_BLM_MAX).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
    ).select("doc_id", "text")
    cleaned = D2.remove_duplicate_spans(
        kept, "text", "doc_id", span_tokens=8, keep_first=True
    )
    chunks = C.chunk_documents(
        cleaned.select(F.col("id").alias("doc_id"), F.col("text_clean").alias("text")),
        chunk_tokens=V2_W,
        stride=V2_S,
    ).select(
        (F.col("id") * V2_KEY_MULT + F.col("chunk_id")).alias("chunk_key"),
        "n_tokens",
    )
    sharded = C.shuffle_shards(
        chunks, n_shards=V2_SHARDS, seed=V2_SEED, id_col="chunk_key"
    )
    joined = sharded.join(
        chunks.select(F.col("chunk_key").alias("id"), "n_tokens"), "id"
    )
    return (
        joined.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.min(F.when(F.col("pos") == 0, F.col("id"))).alias("first_chunk"),
            F.sum(
                (F.col("pos") + 1)
                * (C.h28(F.col("id").cast("string")) % V2_CHECK_MOD)
            )
            .cast("long")
            .alias("order_checksum"),
        )
        .orderBy("shard")
    )
