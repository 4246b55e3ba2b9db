"""Passage-level (chunk) deduplication across a corpus — the C4/RefinedWeb
"remove boilerplate lines repeated across documents" step, expressed over
fixed-width word chunks because the synthetic corpus has no line structure
(TESTDATA.md documents are single-line word streams; on real web text the
chunker is `split(text, '\\n')` and everything downstream is identical).

No reference counterpart (/root/reference has no text corpus); this extends
the dedup family (operators/dedup.py) from whole-document to sub-document
granularity: exact dedup catches identical docs, MinHash catches near-dup
docs, passage scrub removes the boilerplate that contaminates *distinct*
docs (headers, navigation, license blurbs).

Scale shape (100 TB): one explode (×n_chunks/doc), one grouped count on the
chunk string (map-side combine shrinks it to distinct-chunk cardinality),
one anti-join back on the same chunk key (AQE reuses the exchange), one
groupBy doc_id to reassemble. All built-in expressions — no UDF, nothing
driver-side. The chunk-frequency frame is the classic hot-key risk (empty
or all-equal boilerplate chunks dominate); the grouped count bounds each
reducer at distinct-chunk granularity, and the anti-join side is
pre-shrunk to only chunks above the threshold, so the broadcast threshold
usually picks it up as a broadcast anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.expr import floor_parallelism
from payroll_etl_fastapi_spark.operators.text import normalize_text

__all__ = ["chunk_docs", "common_chunks", "scrub_common_passages"]


def chunk_docs(
    docs: DataFrame,
    chunk_words: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk): consecutive ``chunk_words``-word windows of
    the normalized text; the final chunk may be short. Pure projection +
    posexplode — no shuffle (the CPU-bound tokenize kernel gets the shared
    core-count floor, a no-op at production split counts)."""
    docs = floor_parallelism(docs)
    words = F.split(normalize_text(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(chunk_words))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(words, i * chunk_words + 1, chunk_words), " "
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_idx", "chunk"),
    )


def common_chunks(chunks: DataFrame, min_docs: int) -> DataFrame:
    """Chunks appearing in >= min_docs DISTINCT documents — the boilerplate
    set. One shuffle on the chunk string; count(distinct doc_id) rather than
    count(*) so a chunk repeated inside one document is not boilerplate."""
    return (
        chunks.groupBy("chunk")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def scrub_common_passages(
    docs: DataFrame,
    chunk_words: int = 10,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every chunk that occurs in >= min_docs documents and reassemble
    the survivors in document order. Output per input doc (docs that lose
    every chunk still emit a row with cleaned_text = ''):

        doc_id, n_chunks, n_kept, cleaned_text

    Chunking is positional, so a boilerplate passage is only removed where it
    is chunk-aligned — the honest semantics of line-dedup transplanted to
    fixed windows (real line-dedup is alignment-free because newlines anchor
    the chunks)."""
    chunks = chunk_docs(docs, chunk_words, id_col, text_col)
    boiler = common_chunks(chunks, min_docs)
    kept = chunks.join(boiler.select("chunk"), "chunk", "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )
