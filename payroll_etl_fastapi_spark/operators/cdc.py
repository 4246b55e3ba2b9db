"""Change-data-capture and slowly-changing-dimension operators.

The reference's write path is type-1 overwrite semantics only: full-replace
loads (/root/reference/scripts/load_once.py:24-34) and last-write-wins
upserts through ON CONFLICT DO UPDATE (/root/reference/src/etl.py:24-38).
This module supplies the three maintenance operators a warehouse user needs
the day they outgrow that: ordered CDC feed application (with deletes),
SCD Type-2 version history, and mergeable-state incremental rollup refresh.

All three are single-shuffle plans on the business key:

- ``cdc_apply``      : 1 exchange of the (small) feed for the per-key window
                       + 1 exchange of the snapshot for the outer join. The
                       snapshot is never windowed — only joined.
- ``scd2_apply``     : 1 exchange of (dim ∪ changes) for one lead() window.
- ``merge_agg_states``: re-aggregation of partial states — the classic
                       map-side-combine identity (sum of sums, min of mins)
                       that makes incremental refresh correct at any batch
                       boundary.

At 100 TB the CDC feed and the change set are orders of magnitude smaller
than the snapshot/dimension; every plan here keeps the big side to a single
key-partitioned exchange (or none, when the snapshot is already bucketed by
key — see sources/bucketing.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cdc_apply", "scd2_apply", "merge_agg_states"]


def cdc_apply(
    snapshot: DataFrame,
    feed: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered change feed to a snapshot; last writer wins per key.

    ``feed`` carries the snapshot's columns plus ``op_col`` ('U' = upsert,
    'D' = delete) and ``seq_col`` (a total order per key — e.g. a log offset;
    ties broken deterministically by preferring the delete, so a same-seq
    U/D pair cannot flip between runs). The result is the snapshot with every
    key's LATEST feed row applied: 'U' inserts-or-replaces, 'D' removes.

    Shape: the window runs over the feed only (small); the snapshot takes
    exactly one shuffle for the join. Equivalent to, but cheaper than, a
    MERGE statement re-sorting the union of both sides.
    """
    key_list = list(keys)
    extra = {op_col, seq_col}
    payload_cols = [c for c in feed.columns if c not in extra]
    if set(payload_cols) != set(snapshot.columns):
        raise ValueError(
            f"feed payload columns {sorted(payload_cols)} must match snapshot "
            f"columns {sorted(snapshot.columns)}"
        )

    # deterministic payload tiebreak for same-(key, seq, op) rows — without
    # it the surviving payload is whichever row the shuffle ordered first
    # (the nondeterminism upsert() fixed; ADVICE r2). Only ORDERABLE payload
    # types can join the sort: a map column would fail analysis, so
    # non-orderable columns are excluded (their ties stay nondeterministic —
    # the pre-fix behavior — rather than breaking previously-valid feeds).
    feed_types = dict(zip(feed.columns, [f.dataType for f in feed.schema.fields]))

    def _orderable(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        if isinstance(dt, T.ArrayType):
            return _orderable(dt.elementType)
        return True

    tiebreak = [
        F.col(c)
        for c in sorted(c for c in payload_cols if c not in key_list)
        if _orderable(feed_types[c])
    ]
    w = Window.partitionBy(*key_list).orderBy(
        F.col(seq_col).desc(),
        F.when(F.col(op_col) == "D", F.lit(0)).otherwise(F.lit(1)),
        *tiebreak,
    )
    winners = (
        feed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    survivors = snapshot.join(winners.select(*key_list), key_list, "left_anti")
    inserts = winners.filter(F.col(op_col) == "U").select(*snapshot.columns)
    return survivors.unionByName(inserts)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Build a Type-2 version history from a base dimension plus change rows.

    ``dim`` is the version-0 state (its ``seq_col`` gives each row's initial
    effective sequence, typically a constant 0); ``changes`` carries the same
    schema with later sequences. Output = every version with
    ``valid_from_seq`` / ``valid_to_seq`` (half-open, NULL = open-ended) and
    ``is_current``. Keys with no changes come through as a single open
    version — the common case, and the reason the plan must not special-case
    them (one uniform window pass, no anti-join to find "unchanged" keys).

    Shape: one exchange of (dim ∪ changes) on the key, one sort, one lead().
    """
    key_list = list(keys)
    unioned = dim.unionByName(changes)
    w = Window.partitionBy(*key_list).orderBy(seq_col)
    return (
        unioned.withColumn("valid_from_seq", F.col(seq_col))
        .withColumn("valid_to_seq", F.lead(seq_col).over(w))
        .withColumn("is_current", F.col("valid_to_seq").isNull())
        .drop(seq_col)
    )


def merge_agg_states(
    states: Sequence[DataFrame],
    keys: Sequence[str],
    merge_exprs: dict[str, str],
) -> DataFrame:
    """Merge partial aggregation states into the state of the union of their
    inputs — the incremental-refresh primitive: keep yesterday's state,
    aggregate only today's partition, merge.

    ``merge_exprs`` maps state column → merge function name ('sum', 'min',
    'max'); only decomposable aggregates belong here (a mean must be carried
    as sum+count and derived after the merge; a median cannot be carried at
    all — re-aggregate or use a mergeable sketch, operators/approx.py).

    Shape: a union of (tiny) state frames + one grouped aggregate. At 100 TB
    this replaces a full fact-table rescan with a scan of the new partition
    only — the merge itself touches |keys| × |states| rows.
    """
    allowed = {"sum", "min", "max"}
    bad = {f for f in merge_exprs.values() if f not in allowed}
    if bad:
        raise ValueError(f"non-mergeable merge functions {sorted(bad)}; use {sorted(allowed)}")
    key_list = list(keys)
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    aggs = [getattr(F, fn)(c).alias(c) for c, fn in merge_exprs.items()]
    return unioned.groupBy(*key_list).agg(*aggs)
