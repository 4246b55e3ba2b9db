"""Lexical-search gate queries: BM25 top-k retrieval over the documents
corpus (operators/search.py), query-by-example style — queries are excerpts
of every 173rd document, so the query set is deterministic and derived from
the data in both engines identically.

Determinism: k1/b exactly representable, per-term double score snapped to
integer micro-units before the per-document sum (order-free), log-free
Robertson idf (rational). See operators/search.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import search as S
from payroll_etl_fastapi_spark.operators import text as T
from payroll_etl_fastapi_spark.plans.suite import _t, query
from payroll_etl_fastapi_spark.plans.suite_text import _SQL_TOKS

_QUERY_MOD = 173     # every 173rd doc seeds a query
_QUERY_TERMS = 4     # first 4 distinct tokens of the doc are its terms
_TOP_K = 10


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_SQL_TOKS.format(col='text')} AS words FROM documents
    ),
    qt AS (
        SELECT doc_id AS query_id,
               unnest(list_distinct(words[1:{_QUERY_TERMS}])) AS term
        FROM w WHERE doc_id % {_QUERY_MOD} = 0
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS token FROM w)
        GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, len(words) AS dl FROM w),
    consts AS (
        SELECT count(*) AS n_docs, CAST(sum(len(words)) AS BIGINT) AS total_tokens
        FROM w
    ),
    hits AS (
        SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, tf.token
        FROM tf JOIN qt ON tf.token = qt.term JOIN dl USING (doc_id)
    ),
    dfc AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token
    ),
    s AS (
        SELECT query_id, h.doc_id,
               CAST(floor(
                   ((CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
                   * ((CAST(h.tf AS DOUBLE) * 2.25)
                      / (CAST(h.tf AS DOUBLE)
                         + 1.25 * (0.25 + 0.75 * (CAST(h.dl AS DOUBLE)
                             / (CAST(c.total_tokens AS DOUBLE) / CAST(c.n_docs AS DOUBLE))))))
                   * 1000000.0 + 0.5) AS BIGINT) AS term_micro
        FROM hits h JOIN dfc d USING (token) CROSS JOIN consts c
    ),
    agg AS (
        SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
        FROM s GROUP BY query_id, doc_id
    )
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
           doc_id, score_micro
    FROM agg
    QUALIFY rank <= {_TOP_K}
    ORDER BY query_id, rank
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{_TOP_K} retrieval (operators.search.bm25_topk), queries =
    first {_QUERY_TERMS} distinct tokens of every {_QUERY_MOD}th document.
    The query doc itself ranking first is the query-by-example sanity anchor.

    Scale shape: one explode + one (doc_id, token) aggregate builds the
    postings; the broadcast query-term join restricts everything downstream
    to matching postings before df/idf/scoring — no vocab- or corpus-wide
    work after the index build (see operators/search.py)."""
    docs = _t(spark, sf_dir, "documents")
    qterms = (
        docs.filter(F.col("doc_id") % _QUERY_MOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice(T.tokens(F.col("text")), 1, _QUERY_TERMS))
            ).alias("term"),
        )
    )
    return S.bm25_topk(docs, qterms, k=_TOP_K).orderBy("query_id", "rank")


_RRF_K = 60
_SQL_COSINE_DIM = 64


def _hybrid_oracle() -> str:
    from payroll_etl_fastapi_spark.plans.suite_similarity import (
        _sql_cosine,
    )

    return f"""
    WITH w AS (
        SELECT doc_id, {_SQL_TOKS.format(col='text')} AS words FROM documents
    ),
    qt AS (
        SELECT doc_id AS query_id,
               unnest(list_distinct(words[1:{_QUERY_TERMS}])) AS term
        FROM w WHERE doc_id % {_QUERY_MOD} = 0
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS token FROM w)
        GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, len(words) AS dl FROM w),
    consts AS (
        SELECT count(*) AS n_docs, CAST(sum(len(words)) AS BIGINT) AS total_tokens
        FROM w
    ),
    hits AS (
        SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, tf.token
        FROM tf JOIN qt ON tf.token = qt.term JOIN dl USING (doc_id)
    ),
    dfc AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token
    ),
    s AS (
        SELECT query_id, h.doc_id,
               CAST(floor(
                   ((CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
                   * ((CAST(h.tf AS DOUBLE) * 2.25)
                      / (CAST(h.tf AS DOUBLE)
                         + 1.25 * (0.25 + 0.75 * (CAST(h.dl AS DOUBLE)
                             / (CAST(c.total_tokens AS DOUBLE) / CAST(c.n_docs AS DOUBLE))))))
                   * 1000000.0 + 0.5) AS BIGINT) AS term_micro
        FROM hits h JOIN dfc d USING (token) CROSS JOIN consts c
    ),
    agg AS (
        SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
        FROM s GROUP BY query_id, doc_id
    ),
    lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, doc_id) AS lex_rank
        FROM agg
        QUALIFY lex_rank <= {_TOP_K}
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id % {_QUERY_MOD} = 0
    ),
    scored AS (
        SELECT q.query_id, e.vec_id AS doc_id,
               {_sql_cosine('q.qv', 'e.embedding')} AS cosine
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id
    ),
    vec AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, doc_id) AS vec_rank
        FROM scored
        QUALIFY vec_rank <= {_TOP_K}
    ),
    fused AS (
        SELECT coalesce(l.query_id, v.query_id) AS query_id,
               coalesce(l.doc_id, v.doc_id)     AS doc_id,
               CAST(coalesce(1000000 // ({_RRF_K} + l.lex_rank), 0)
                  + coalesce(1000000 // ({_RRF_K} + v.vec_rank), 0) AS BIGINT)
                                                AS rrf_micro,
               l.lex_rank IS NOT NULL           AS in_lex,
               v.vec_rank IS NOT NULL           AS in_vec
        FROM lex l FULL OUTER JOIN vec v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, rrf_micro, in_lex, in_vec,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
                AS fused_rank
    FROM fused
    QUALIFY fused_rank <= {_TOP_K}
    ORDER BY query_id, fused_rank
    """


@query("search_hybrid_rrf", oracle=_hybrid_oracle())
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the canonical RAG
    retrieval shape: the SAME query documents drive a lexical BM25 leg
    (their first terms) and a vector leg (their embeddings, exact cosine),
    and the two top-10 lists fuse by RRF — score = Σ 1/(60 + rank),
    computed as the exact integer 1000000 DIV (60 + rank) so the fusion,
    flags, and final ranking replay in SQL bit-for-bit. Docs found by
    BOTH legs surface first (the fusion property); each row carries
    in_lex / in_vec provenance.

    Scale shape: each leg keeps its own contract (broadcast query terms
    restricting the postings; broadcast query vectors scanning the corpus
    once); the fusion is a FULL OUTER equality join of two k-row-per-query
    lists and a window over ≤ 2k rows per query — nothing fused is ever
    corpus-sized. NEW in round 4 (post-tail); round-5 rotation
    candidate."""
    from pyspark.sql import Window

    from payroll_etl_fastapi_spark.operators import similarity as sim

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qterms = (
        docs.filter(F.col("doc_id") % _QUERY_MOD == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(F.slice(T.tokens(F.col("text")), 1, _QUERY_TERMS))
            ).alias("term"),
        )
    )
    lex = S.bm25_topk(docs, qterms, k=_TOP_K).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    vq = emb.filter(F.col("vec_id") % _QUERY_MOD == 0)
    vec = sim.cosine_topk(emb, vq, _TOP_K).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = lex.join(vec, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 DIV ({_RRF_K} + vec_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
        F.col("lex_rank").isNotNull().alias("in_lex"),
        F.col("vec_rank").isNotNull().alias("in_vec"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.col("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= _TOP_K)
        .select(
            "query_id", "doc_id", "rrf_micro", "in_lex", "in_vec", "fused_rank"
        )
        .orderBy("query_id", "fused_rank")
    )


# ---------------------------------------------------------------------------
# known-item retrieval quality (round 7)
# ---------------------------------------------------------------------------

_KI_MOD = 205       # targets: every 41st doc of the %5 slice
_KI_K = 10


def _ki_markers_sql(id_expr: str) -> tuple[str, str, str]:
    """The three query-marker terms for a target id, as SQL expressions."""
    return tuple(
        f"'zq' || CAST({id_expr} AS VARCHAR) || '{suf}'" for suf in ("a", "b", "c")
    )


def _known_item_oracle() -> str:
    a0, b0, c0 = _ki_markers_sql("doc_id")
    a5, b5, _ = _ki_markers_sql("doc_id - 5")
    a10, _, _ = _ki_markers_sql("doc_id - 10")
    return f"""
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    planted AS (
        SELECT doc_id,
               CASE
                 WHEN doc_id % {_KI_MOD} = 0 THEN
                   text || ' ' || {a0} || ' ' || {b0} || ' ' || {c0}
                        || ' ' || {a0} || ' ' || {b0} || ' ' || {c0}
                 WHEN doc_id % {_KI_MOD} = 5 THEN
                   text || ' ' || {a5} || ' ' || {b5}
                        || ' ' || {a5} || ' ' || {b5}
                        || ' ' || {a5} || ' ' || {b5}
                 WHEN doc_id % {_KI_MOD} = 10 THEN
                   text || ' ' || {a10} || ' ' || {a10}
                        || ' ' || {a10} || ' ' || {a10}
                 ELSE text
               END AS text
        FROM base
    ),
    w AS (
        SELECT doc_id, {_SQL_TOKS.format(col='text')} AS words FROM planted
    ),
    qt AS (
        SELECT doc_id AS query_id,
               unnest([{a0}, {b0}, {c0}]) AS term
        FROM base WHERE doc_id % {_KI_MOD} = 0
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(words) AS token FROM w)
        GROUP BY doc_id, token
    ),
    dl AS (SELECT doc_id, len(words) AS dl FROM w),
    consts AS (
        SELECT count(*) AS n_docs, CAST(sum(len(words)) AS BIGINT) AS total_tokens
        FROM w
    ),
    hits AS (
        SELECT qt.query_id, tf.doc_id, tf.tf, dl.dl, tf.token
        FROM tf JOIN qt ON tf.token = qt.term JOIN dl USING (doc_id)
    ),
    dfc AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM hits GROUP BY token
    ),
    s AS (
        SELECT query_id, h.doc_id,
               CAST(floor(
                   ((CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                    / (CAST(d.df AS DOUBLE) + 0.5))
                   * ((CAST(h.tf AS DOUBLE) * 2.25)
                      / (CAST(h.tf AS DOUBLE)
                         + 1.25 * (0.25 + 0.75 * (CAST(h.dl AS DOUBLE)
                             / (CAST(c.total_tokens AS DOUBLE) / CAST(c.n_docs AS DOUBLE))))))
                   * 1000000.0 + 0.5) AS BIGINT) AS term_micro
        FROM hits h JOIN dfc d USING (token) CROSS JOIN consts c
    ),
    agg AS (
        SELECT query_id, doc_id, CAST(sum(term_micro) AS BIGINT) AS score_micro
        FROM s GROUP BY query_id, doc_id
    ),
    topk AS (
        SELECT query_id, doc_id,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
        FROM agg
        QUALIFY rank <= {_KI_K}
    ),
    targets AS (SELECT doc_id AS query_id FROM base WHERE doc_id % {_KI_MOD} = 0)
    SELECT t.query_id,
           CAST(coalesce(k.rank, 0) AS BIGINT)                    AS target_rank,
           CAST(CASE WHEN k.rank IS NULL THEN 0
                     ELSE 10000 // k.rank END AS BIGINT)          AS rr_bp
    FROM targets t
    LEFT JOIN topk k ON k.query_id = t.query_id AND k.doc_id = t.query_id
    ORDER BY t.query_id
    """


@query("search_bm25_known_item", oracle=_known_item_oracle())
def search_bm25_known_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-item retrieval quality, measured in-engine (round 7 — the
    search member of the quality trilogy next to ann_lsh_recall and
    dedup_lsh_pair_recall): the determinism oracle proves BM25 computes its
    formula exactly, which says nothing about whether that formula RANKS
    WELL. This gate plants a gold standard the spec must recover: each
    target doc gets three unique marker terms (tf = 2); a sibling doc gets
    two of the three at HIGHER tf (×3); another gets one at tf 4 — so
    tf-saturation (k1) must lose to idf term coverage, BM25's core ranking
    property. Output is each query's target rank and reciprocal-rank basis
    points (integers the oracle replays bit-for-bit). A spec change that
    wrecks ranking while staying deterministic — micro-snap collapsing
    score gaps, an idf surrogate breaking rank equivalence, df counted per
    posting instead of per doc — flips this gate while every existing
    search gate stays green. Floor pinned in tests/test_search.py."""
    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )

    def marks(id_col: F.Column) -> tuple[F.Column, F.Column, F.Column]:
        return tuple(
            F.concat(F.lit("zq"), id_col.cast("string"), F.lit(s))
            for s in ("a", "b", "c")
        )

    a0, b0, c0 = marks(F.col("doc_id"))
    a5, b5, _ = marks(F.col("doc_id") - 5)
    a10, _, _ = marks(F.col("doc_id") - 10)
    sp = F.lit(" ")
    planted = base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % _KI_MOD == 0,
            F.concat(F.col("text"), sp, a0, sp, b0, sp, c0, sp, a0, sp, b0, sp, c0),
        )
        .when(
            F.col("doc_id") % _KI_MOD == 5,
            F.concat(F.col("text"), sp, a5, sp, b5, sp, a5, sp, b5, sp, a5, sp, b5),
        )
        .when(
            F.col("doc_id") % _KI_MOD == 10,
            F.concat(F.col("text"), sp, a10, sp, a10, sp, a10, sp, a10),
        )
        .otherwise(F.col("text")),
    )
    targets = base.filter(F.col("doc_id") % _KI_MOD == 0).select(
        F.col("doc_id").alias("query_id")
    )
    qa, qb, qc = marks(F.col("query_id"))
    queries = targets.select(
        "query_id", F.explode(F.array(qa, qb, qc)).alias("term")
    )
    topk = S.bm25_topk(planted, queries, k=_KI_K)
    hit = topk.filter(F.col("doc_id") == F.col("query_id")).select(
        "query_id", "rank"
    )
    return (
        targets.join(hit, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("rank"), F.lit(0)).cast("long").alias("target_rank"),
            F.when(F.col("rank").isNotNull(), F.expr("10000 DIV rank"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_bp"),
        )
        .orderBy("query_id")
    )
