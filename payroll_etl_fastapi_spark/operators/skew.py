"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically; these helpers cover the cases AQE cannot: a groupBy whose hot
key overwhelms one reducer, and a shuffle join against a *small-but-not-tiny*
table where one probe key dominates.

Both are pure plan rewrites — results are exactly equal to the unsalted
equivalent (verified by tests), so callers can apply them based on observed
key histograms without changing semantics.

Scale notes (100 TB): a single key holding 1% of a 100 TB fact is 1 TB into
one task without salting. Salting bounds per-task input at shuffle time for
the price of a second (tiny) aggregation over `salt_buckets × |keys|` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).sum(...) in two stages: (keys, salt) partial sums — at
    most `salt_buckets` tasks share one hot key — then a final cheap combine
    over salt_buckets×|keys| rows.

    `sums` maps input column → output alias. Sums (and counts via a lit(1)
    column) are the decomposable aggregates this pattern supports; avg/median
    need their own decompositions.

    The salt is a DETERMINISTIC per-row hash, not rand(): a non-deterministic
    partitioning expression re-salts rows when a stage is recomputed after a
    fetch failure, double-counting or dropping partial sums (the classic
    SPARK-23207-class hazard). Hashing every column spreads a hot key across
    buckets as long as its rows differ anywhere; fully identical rows share
    a bucket, which skews balance but never correctness."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(c).alias(f"_p_{a}") for c, a in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{a}").alias(a) for a in sums.values()]
    )


def replicated_salt_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `big` has skewed keys and `small` is too large to
    broadcast outright: salt the big side, replicate the small side
    salt_buckets×, join on (key, salt). Every physical join key now carries
    ≤ 1/salt_buckets of a hot key's rows.

    Output columns = the plain `big.join(small, key, how)` (salt dropped).

    Join types preserving the big side only are supported. Right/full outer
    would emit each unmatched small-side key once PER REPLICA (salt_buckets
    copies instead of one) — rejected rather than silently wrong."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"replicated_salt_join supports inner/left/semi/anti joins, not {how!r}: "
            "the replicated small side would duplicate unmatched right-side rows"
        )
    # deterministic per-row salt (see salted_sum): retry-safe under stage
    # recomputation, unlike rand()
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int")
    )
    s = small.crossJoin(
        F.broadcast(
            b.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Top-N key frequencies — the observability step that decides whether
    salting is worth it (run on a sample at 100 TB)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col(key))
        .limit(top)
    )
