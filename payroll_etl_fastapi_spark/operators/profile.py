"""Column-profiling operator: one-pass per-column statistics for a table.

The reference inspects its warehouse with psql introspection scripts
(/root/reference/scripts/inspect_db.py:10-42 — row counts and column lists);
this operator is the engine-native generalization a data team actually runs
before training on a new corpus: null counts, exact distinct counts, min/max
and value-length stats for every column, in a SINGLE aggregate pass.

Output is long-form — one row per profiled column — so downstream checks
(null-ratio alerts, key-candidate detection) are plain filters.

Scale notes: all statistics except distinct counts are plain partial
aggregates (one shuffle of one combined row per partition). Multiple exact
COUNT(DISTINCT) in one aggregate make Catalyst plan an Expand (input ×
n_cols before the shuffle) — correct, and acceptable for a profile pass,
but at 100 TB the default should be ``exact_distinct=False``, which swaps
in approx_count_distinct (HyperLogLog++, mergeable, no Expand). The gate
query pins the exact path against the oracle; test_profile covers both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_columns"]

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in one aggregate pass.

    Returns one row per column: ``column_name``, ``n_rows``, ``n_null``,
    ``n_distinct``, ``num_min``/``num_max`` (doubles; NULL for non-numeric
    columns), ``str_min``/``str_max`` (NULL for non-string columns), and
    ``sum_len`` (total string length; NULL for non-strings — an exact
    integer, unlike a float mean, so it survives any aggregation order).
    """
    schema = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = list(cols) if cols is not None else df.columns
    for c in names:
        if c not in schema:
            raise KeyError(f"no column {c!r}; have {df.columns}")

    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for c in names:
        dt = fields[c]
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        aggs.append(F.count(c).alias(f"{c}__nn"))
        if exact_distinct:
            aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"{c}__nd"))
        aggs.append(
            (F.min(c).cast("double") if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__nmin")
        )
        aggs.append(
            (F.max(c).cast("double") if is_num else F.lit(None).cast("double"))
            .alias(f"{c}__nmax")
        )
        aggs.append(
            (F.min(c) if is_str else F.lit(None).cast("string")).alias(f"{c}__smin")
        )
        aggs.append(
            (F.max(c) if is_str else F.lit(None).cast("string")).alias(f"{c}__smax")
        )
        aggs.append(
            (F.sum(F.length(c)).alias(f"{c}__slen") if is_str
             else F.lit(None).cast("bigint").alias(f"{c}__slen"))
        )

    wide = df.agg(*aggs)  # single row
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col(f"{c}__nn")).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__nmin").alias("num_min"),
            F.col(f"{c}__nmax").alias("num_max"),
            F.col(f"{c}__smin").alias("str_min"),
            F.col(f"{c}__smax").alias("str_max"),
            F.col(f"{c}__slen").alias("sum_len"),
        )
        for c in names
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def hot_keys(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 20
) -> DataFrame:
    """(keys..., n_rows, share_bp): the ``top_k`` heaviest key tuples and
    their integral-basis-point share of the table — the skew DIAGNOSTIC
    that belongs next to the skew REMEDIES (operators/skew.py salting,
    AQE skew joins): before salting a join you measure which keys are hot
    and how hot, because a 40%-share key needs a different plan than a
    long flat tail.

    One grouped count with map-side combine + a broadcast one-row total +
    TakeOrderedAndProject for the top-K — the diagnostic costs one
    aggregate regardless of table size, and its output is top_k rows by
    construction."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.expr("n_rows * 10000 DIV __total").alias("share_bp"),
        )
        .orderBy(F.col("n_rows").desc(), *key_cols)
        .limit(top_k)
    )


def table_fingerprint(
    df: DataFrame, cols: Sequence[str], n_buckets: int = 16
) -> DataFrame:
    """(bucket, n_rows, checksum): an ORDER-INDEPENDENT content fingerprint
    of the projected table, split across ``n_buckets`` row-hash buckets —
    the anti-entropy primitive for replica/sync verification (Cassandra /
    DynamoDB Merkle-tree lineage, flattened to one level): two replicas
    compare 16 (bucket, count, checksum) rows instead of the data, and a
    mismatched bucket narrows the diff to 1/n_buckets of the keyspace.

    Each row is canonicalized to one string (NULL spelled explicitly so
    ('a', NULL) ≠ ('aNULL', absent)), hashed to a 28-bit integer via md5
    (portable across engines — no xxhash in SQL replays), and SUMMED per
    bucket: addition commutes, so any partitioning, ordering, or retry
    produces the identical checksum. Pure scan + one tiny aggregate; no
    shuffle wider than n_buckets rows."""
    canon = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    )
    h = F.conv(F.substring(F.md5(canon), 1, 7), 16, 10).cast("long")
    return (
        df.select(h.alias("__h"))
        .groupBy((F.col("__h") % n_buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h").alias("checksum"),
        )
        .orderBy("bucket")
    )
