"""Upsert operators — the Spark analog of the reference's ON CONFLICT upserts.

Reference semantics being reproduced (SURVEY.md §2.1 S10-S12):
- S10 insert-if-absent:       /root/reference/src/etl.py:21-29
      (INSERT … SELECT DISTINCT … ON CONFLICT DO NOTHING)
- S11 type-1 SCD upsert:      /root/reference/src/etl.py:36-46
      (ON CONFLICT (emp_id) DO UPDATE — new row wins)
- S12 composite-key upsert:   /root/reference/src/etl.py:65-77
      (ON CONFLICT (emp_id, month) DO UPDATE SET all measures)

Mechanism: Delta MERGE would be the first choice, but delta-spark is not available
in this environment, so these are pure-DataFrame merge plans over parquet:
union-by-name with a source priority, then keep-one-per-key via row_number.

Scale notes: the window partitions by the upsert key, so the shuffle is exactly
one hash exchange on the key — the same shuffle a MERGE's join would pay. For a
month-partitioned fact, callers should restrict `existing` to the months present
in `updates` before merging (partition pruning → only affected partitions are
rewritten), which is what etl.load() does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PRIORITY = "__src_priority"


def upsert(existing: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """ON CONFLICT (keys) DO UPDATE — rows from `updates` win on key collision.

    Column set is taken from `existing`; `updates` must carry the same columns.

    If `updates` itself carries duplicate keys (Postgres ON CONFLICT would
    error: "row affected a second time"), the survivor is made deterministic
    by tie-breaking on every non-key column — same input, same output, every
    run, regardless of shuffle order.
    """
    ex = existing.withColumn(_PRIORITY, F.lit(1))
    up = updates.select(*existing.columns).withColumn(_PRIORITY, F.lit(0))
    tiebreak = [F.col(c) for c in existing.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(F.col(_PRIORITY).asc(), *tiebreak)
    return (
        ex.unionByName(up)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _PRIORITY)
    )


def insert_if_absent(existing: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """ON CONFLICT (keys) DO NOTHING — existing rows win; new keys appended.

    Expressed as a left-anti join (only new keys survive) + union: Catalyst
    broadcasts the small side and no window is needed.
    """
    new_rows = updates.select(*existing.columns).dropDuplicates(list(keys)).join(
        existing.select(*keys), on=list(keys), how="left_anti"
    )
    return existing.unionByName(new_rows)
