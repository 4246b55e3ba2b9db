"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling both
sides. Writing both tables bucketed by the join key (same bucket count) lets
Spark prove matching partitioning at plan time: the join compiles to a
zero-Exchange sort-merge over aligned bucket files. Same for repeated
groupBy on the bucket key.

The reference's analog is its PK/FK B-trees resolving upsert conflicts
(/root/reference/src/models.py:31,46-50); bucketing is the Spark-native way
to pre-pay that organization once at write time and reuse it every query.

Bucketing metadata lives in the session catalog (saveAsTable); plain
`.parquet(path)` writes cannot carry it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed (and optionally per-bucket-sorted) catalog
    table. Sorting by the bucket key as well lets sort-merge joins skip
    their sort step entirely."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (spark.table, not
    spark.read.parquet — a raw path read loses the metadata)."""
    return spark.table(table)
