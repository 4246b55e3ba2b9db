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
