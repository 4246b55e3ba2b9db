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


# ---------------------------------------------------------------------------
# pipeline v3 (round 11, VERDICT r10 #7): the corpus.Pipeline FACADE itself,
# driver-gated — the user-facing surface (stage factories + Pipeline.run)
# previously earned evidence only via hash-equality pytests to the
# hand-wired v2 gate. This gate CONSTRUCTS the verdict's composition
# (filter → near-dedup → semantic-dedup(target_recall=) → chunk → shard),
# runs it end-to-end on the documents+embeddings tables, and the oracle
# replays the composed SQL of every dispatched stage.
# ---------------------------------------------------------------------------

V3_LANGS = ("en", "de", "fr")
V3_NEAR_T = 0.8          # stage_near_dedup threshold -> lsh_params_for = (20, 5)
V3_NEAR_H, V3_NEAR_B = 20, 5
V3_SEM_T = 0.9           # semantic cosine threshold
V3_SEM_RECALL = 0.85     # dedup-shape ask -> the lsh_multiprobe family,
#                            dispatched under the THRESHOLD-DERIVED
#                            self-join banding (corpus.dedup_lsh_banding:
#                            45 planes / 5 bands / 2 flips at 0.9 — the
#                            retrieval 32/8 banding admitted 81% of random
#                            pairs and went quadratic at sf1)
V3_COPY = 1_000_000      # planted semantic twins (dedup_embedding_cosine's shape)
V3_DIM = 64


def _sql_minhash_est_pairs(num_hashes: int, bands: int, min_est: float) -> str:
    """CTE chain ``fmh/fbands/fcand`` ending in ``npairs(id_a, id_b)`` —
    the est-verified MinHash-LSH pairs minhash_lsh_pairs(threshold=)
    returns, at the S-curve-derived band structure (the dedup_minhash_lsh
    oracle's logic, parameterized; assumes ``corpus`` + the shingle CTEs
    precede it)."""
    from payroll_etl_fastapi_spark.operators import dedup as D

    coeffs = D.minhash_coefficients(num_hashes)
    p = D.MERSENNE_P
    h = "CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)"
    mins = ",\n               ".join(
        f"min(({a} * {h} + {b}) % {p}) AS mh_{i}" for i, (a, b) in enumerate(coeffs)
    )
    rpb = num_hashes // bands
    band_selects = "\n        UNION ALL\n".join(
        "        SELECT id, {b} AS band, {sig} AS sig FROM fmh".format(
            b=b,
            sig=" || ',' || ".join(
                f"CAST(mh_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            ),
        )
        for b in range(bands)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )
    return f"""fmh AS (
        SELECT id, {mins}
        FROM sh GROUP BY id
    ),
    fbands AS (
{band_selects}
    ),
    fcand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM fbands x JOIN fbands y
          ON x.band = y.band AND x.sig = y.sig AND x.id < y.id
    ),
    npairs AS (
        SELECT fcand.id_a, fcand.id_b
        FROM fcand
        JOIN fmh a ON fcand.id_a = a.id
        JOIN fmh b ON fcand.id_b = b.id
        WHERE ({agree}) / {float(num_hashes)} >= {min_est}
    )"""


def _pipeline_v3_oracle() -> str:
    from payroll_etl_fastapi_spark.plans.suite_dedup import _SQL_SHINGLES
    from payroll_etl_fastapi_spark.plans.suite_similarity import (
        _sql_bands_cte,
        _sql_cosine,
        _sql_probe_bands_cte,
    )

    from payroll_etl_fastapi_spark.operators.corpus import dedup_lsh_banding

    sp, sb, sf = dedup_lsh_banding(V3_SEM_T, multiprobe=True)
    langs = ", ".join(f"'{lg}'" for lg in V3_LANGS)
    w, s = V2_W, V2_S
    norm_kept = _SQL_NORM.format(col="text")
    return f"""
    WITH edocs AS (
        SELECT d.doc_id, d.lang, d.text
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    docs_aug AS (
        SELECT doc_id, lang, text FROM edocs
        UNION ALL
        SELECT doc_id + {V3_COPY} AS doc_id, lang,
               'sem copy ' || CAST(doc_id AS VARCHAR) AS text
        FROM edocs WHERE lang IN ({langs})
    ),
    emb_aug AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT e.vec_id + {V3_COPY} AS vec_id,
               list_transform(generate_series(1, {V3_DIM}),
                   i -> CASE WHEN (i - 1) % 7 = 0 THEN CAST(0.0 AS FLOAT)
                             ELSE e.embedding[i] END) AS embedding
        FROM embeddings e JOIN edocs d ON e.vec_id = d.doc_id
        WHERE d.lang IN ({langs})
    ),
    kept0 AS (
        SELECT doc_id AS id, text FROM docs_aug WHERE lang IN ({langs})
    ),
    corpus AS (SELECT id, text FROM kept0),
    {_SQL_SHINGLES},
    {_sql_minhash_est_pairs(V3_NEAR_H, V3_NEAR_B, V3_NEAR_T)},
    ndrop AS (SELECT DISTINCT id_b AS id FROM npairs),
    kept1 AS (
        SELECT k.id, k.text FROM kept0 k
        LEFT JOIN ndrop d ON k.id = d.id WHERE d.id IS NULL
    ),
    emb AS (
        SELECT e.vec_id, e.embedding
        FROM emb_aug e JOIN kept1 k ON e.vec_id = k.id
    ),
    sbands AS (
{_sql_bands_cte('emb', V3_DIM, sp, sb)}
    ),
    pbands AS (
{_sql_probe_bands_cte('emb', V3_DIM, sp, sb, sf)}
    ),
    scand AS (
        SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
                        greatest(a.vec_id, b.vec_id) AS id_b
        FROM pbands a JOIN sbands b ON a.band = b.band AND a.sig = b.sig
        WHERE a.vec_id <> b.vec_id
    ),
    sdrop AS (
        SELECT DISTINCT c.id_b AS id
        FROM scand c
        JOIN emb ea ON c.id_a = ea.vec_id
        JOIN emb eb ON c.id_b = eb.vec_id
        WHERE {_sql_cosine('ea.embedding', 'eb.embedding')} >= {V3_SEM_T}
    ),
    kept2 AS (
        SELECT k.id, k.text FROM kept1 k
        LEFT JOIN sdrop d ON k.id = d.id WHERE d.id IS NULL
    ),
    ctoks AS (
        SELECT id, string_split({norm_kept}, ' ') AS t
        FROM kept2 WHERE {norm_kept} <> ''
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


@query("pipeline_facade_v3", oracle=_pipeline_v3_oracle())
def pipeline_facade_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus.Pipeline FACADE run end-to-end (VERDICT r10 #7) — the
    exact composition the verdict names, built from the stage factories:

    1. stage_language_gate({en,de,fr});
    2. stage_near_dedup(0.8) — MinHash-LSH at the S-curve-planned (20, 5)
       band structure, est-verified, keep-lowest-id;
    3. stage_semantic_dedup(embeddings, cos>=0.9, target_recall=0.85) —
       routed through ann_plan(shape="dedup") to the lsh_multiprobe
       family, dispatched under the threshold-derived SELF-JOIN banding
       (corpus.dedup_lsh_banding: 45 planes / 5 bands / 2 flips at 0.9 —
       junk-bounded at 0.02, where the retrieval banding admitted 81% of
       random pairs); the pick is ASSERTED in-gate, so an ANN_FRONTIER
       edit that moves it fails loudly instead of desynchronizing the
       oracle;
    4. stage_chunk(64/48); 5. stage_shuffle_shard(8 @ seed 7, terminal).

    The corpus is the documents table plus planted SEMANTIC twins (the
    dedup_embedding_cosine shape: per in-language doc, a 'sem copy' text —
    minhash-invisible by construction — whose embedding is the original
    zeroed at every 7th element, cosine ~0.92), so the semantic stage has
    guaranteed work that the near-dedup stage cannot steal. Output is the
    v2 gate's per-shard rollup (count/tokens/position-0 chunk/order
    checksum) — a drift in ANY stage flips a row.

    Scale shape: the facade folds the stages into ONE lazy plan — banded
    equality self-joins for both dedup stages (never all-pairs, corpus
    never broadcast), array-local chunking, one exchange for the shard
    layout."""
    from payroll_etl_fastapi_spark.operators import corpus as C

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Scope: the EMBEDDED corpus (documents ⋉ embeddings) — every doc the
    # semantic stage can act on. The unembedded tail would only re-run
    # minhash/chunk/shard bulk the v2 gate already times, and the semi-join
    # scales with the data (no literal id cutoff to break sf1's offsets).
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi")
    )
    in_lang = docs.filter(F.col("lang").isin(*V3_LANGS))
    docs_aug = docs.unionByName(
        in_lang.select(
            (F.col("doc_id") + V3_COPY).alias("doc_id"),
            "lang",
            F.concat(F.lit("sem copy "), F.col("doc_id").cast("string")).alias(
                "text"
            ),
        )
    )
    emb_aug = emb.unionByName(
        emb.join(
            in_lang.select(F.col("doc_id").alias("vec_id")), "vec_id"
        ).select(
            (F.col("vec_id") + V3_COPY).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: F.when(i % 7 == 0, F.lit(0.0).cast("float")).otherwise(
                    x
                ),
            ).alias("embedding"),
        )
    )
    sem = C.stage_semantic_dedup(
        emb_aug, V3_SEM_T, target_recall=V3_SEM_RECALL, dim=V3_DIM
    )
    # pin the routed pick: the oracle replays the derived 45/5-f2 chain.
    # A hard raise, not a bare assert (ADVICE r11): `python -O` strips
    # asserts, and an ANN_FRONTIER edit that moves the pick would then
    # silently desynchronize gate and oracle instead of failing loudly.
    if "lsh_multiprobe" not in sem.name:
        raise RuntimeError(
            f"pipeline_facade_v3 oracle replays the lsh_multiprobe 45/5-f2 "
            f"chain but ann_plan routed to {sem.name!r} — update the oracle "
            "and this pin together"
        )
    pipe = C.Pipeline(
        [
            C.stage_language_gate(list(V3_LANGS)),
            C.stage_near_dedup(V3_NEAR_T),
            sem,
            C.stage_chunk(V2_W, V2_S),
            C.stage_shuffle_shard(V2_SHARDS, seed=V2_SEED),
        ]
    )
    out = pipe.run(docs_aug)
    return (
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
