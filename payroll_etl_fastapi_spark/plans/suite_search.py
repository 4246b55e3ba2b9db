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
