"""Multimodal queries for the driver gate: binary-payload plumbing over a
media table forged from documents (UTF-8 bytes as payload — the container has
no codec libraries, see operators/multimodal.py).

The feature query runs the REAL mapInPandas path (Arrow batches → Python →
sha256-derived fake features) and the oracle replays the identical bytes →
sha256 → scaled-int pipeline in SQL, so the plumbing is correctness-gated,
not just smoke-tested. Divisions are by 2^32 (exact scaling), so the doubles
are bit-identical before the 1e-6 snap."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import multimodal as MM
from payroll_etl_fastapi_spark.plans.suite import _r6, _sql_r6, _t, query


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id                                  AS media_id,
           octet_length(encode(text))              AS n_bytes,
           substr(sha256(text), 1, 16)             AS sha16,
           {_sql_r6("CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) / 4294967296.0")} AS f0,
           {_sql_r6("CAST(('0x' || substr(sha256(text), 57, 8)) AS BIGINT) / 4294967296.0")} AS f7
    FROM documents
    ORDER BY media_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → feature extraction through the real mapInPandas path
    (operators.multimodal.extract_features); the oracle replays the same
    sha256-derived fake decode byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "sha16",
        _r6(F.col("features")[0]).alias("f0"),
        _r6(F.col("features")[7]).alias("f7"),
    ).orderBy("media_id")


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT source,
           count(*)                         AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text))        AS distinct_payloads,
           max(octet_length(encode(text)))  AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over binary payloads — stays entirely JVM-side
    (md5/length on binary columns); at scale this is the query shape that
    must NOT read pixel data, only the payload column's stats/metadata."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(
            "source",
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_md5").alias("distinct_payloads"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("source")
    )
