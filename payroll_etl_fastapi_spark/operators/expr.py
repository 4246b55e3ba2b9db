"""Expression- and layout-level execution helpers shared across operators.

Two gaps between the logical plan and what actually executes, both measured
on this engine's own gates:

1. ``let`` — Catalyst's subexpression elimination (whole-stage-codegen CSE
   and the interpreted ``SubExprEvaluationRuntime``) does not reach INSIDE
   higher-order functions.  An array pipeline (split → arrays_zip →
   transform) referenced by k output columns of one projection is
   re-executed k times per row.  Binding it once as a lambda variable makes
   every reuse an O(1) load: the Gopher repetition projection dropped
   3.5 s → 1.1 s at sf0.1 (identical results, single task) when its 2-gram
   pipeline went from 3 evaluations to 1.

2. ``floor_parallelism`` — scan parallelism is bounded by input splits, and
   a single-row-group parquet file is ONE split no matter how small
   ``maxPartitionBytes`` goes.  A CPU-bound kernel (shingling, n-gram zips,
   hash mixing) over such a scan runs one task while the other 31 cores
   idle.  At production file counts (a 100 TB table is tens of thousands of
   row groups) the floor is already met and the helper returns its input
   UNCHANGED — no exchange enters the plan; it only acts when the plan's
   partition count is below the session's core count, where one tiny
   round-robin shuffle buys cores× compute parallelism (containment pairs:
   4.1 s → 1.8 s at sf0.1).
"""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def let(body: Callable[..., Column], **bindings: Column) -> Column:
    """Evaluate each binding expression exactly once per row, then apply
    ``body`` to the bound values (in keyword order) — SQL's missing LET.

    Implemented as ``transform(array(struct(<bindings>)), v -> body(v.*))[1]``:
    the struct materializes each binding once, and every lambda-variable
    reference inside ``body`` is a field load, not a re-evaluation.  Use when
    one expensive expression feeds several output columns of the SAME
    projection; for reuse across plan nodes Catalyst's normal CSE already
    applies.
    """
    names = list(bindings)
    boxed = F.array(F.struct(*[bindings[n].alias(n) for n in names]))
    return F.element_at(
        F.transform(boxed, lambda v: body(*[v[n] for n in names])), 1
    )


def floor_parallelism(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition IFF the frame is a pure scan-side pipeline
    (scan → project/filter/union, no shuffle-inducing node) backed by fewer
    than half the session's cores in input files; otherwise return ``df``
    unchanged.

    The guard makes this scale-correct: on a real cluster the scan already
    yields ≥ cores splits and no exchange is added, while on a bench box
    reading single-row-group files it converts a 1-task CPU-bound stage into
    a cores-wide one.  Round-robin assignment is safe here because every
    caller feeds a groupBy/join immediately after the per-row kernel — row
    placement never affects results.  ``multiplier`` widens the target for
    kernels whose per-row cost varies wildly (e.g. documents of very uneven
    length).
    """
    cached = _FLOOR_VERDICTS.get(df)
    if cached is not None:
        needs_floor, cores = cached
        return df.repartition(cores * max(1, multiplier)) if needs_floor else df
    try:
        cores = df.sparkSession.sparkContext.defaultParallelism
        # ZERO-EXECUTION probe. df.rdd.getNumPartitions() would be the
        # direct reading, but under AQE materializing the RDD EXECUTES every
        # intermediate query stage just to learn the partition count (then
        # throws the work away — measured 4 s → 26 s on a gate whose corpus
        # is a computed frame). Instead: the backing file list (metadata
        # only), and a walk over the optimized logical plan's NODE CLASSES
        # to confirm the frame is a pure scan→project/filter/union pipeline
        # — any shuffle-inducing node means the frame already runs at
        # spark.sql.shuffle.partitions width and needs no floor. Class-name
        # matching (not a substring scan of the rendered plan) so a column
        # literally named "sort_key" or a rendered expression containing
        # "Window" can't flip the verdict (ADVICE r6); the analyze+optimize
        # cost is paid once per DataFrame via _FLOOR_VERDICTS.
        files = df.inputFiles()
        jplan = df._jdf.queryExecution().optimizedPlan()
        if files:
            if len(files) * 2 > cores:
                _FLOOR_VERDICTS[df] = (False, cores)
                return df
            needs_floor = not _plan_has_shuffle_node(jplan)
        else:
            # No backing files: the frame may be a pure scan-side pipeline
            # over a (local)checkpointed RDD — LogicalRDD leaves (round 12).
            # Their partition counts are plain metadata on the already-built
            # RDD object (no execution), so the same under-parallelism floor
            # applies: AQE sizes post-shuffle partitions by BYTES, so a tiny
            # checkpointed boundary freezes at 1-2 partitions and a
            # CPU-bound kernel scanning it runs 1-2 tasks while the other
            # cores idle. At production sizes the checkpointed RDD already
            # carries ≥ cores partitions and this path is a no-op.
            nparts = _logical_rdd_partitions(jplan)
            needs_floor = (
                nparts is not None
                and nparts * 2 <= cores
                and not _plan_has_shuffle_node(jplan)
            )
    except Exception:
        # streaming frames and exotic plans: leave untouched
        return df
    _FLOOR_VERDICTS[df] = (needs_floor, cores)
    if not needs_floor:
        return df
    return df.repartition(cores * max(1, multiplier))


# Verdict memo keyed by DataFrame identity: (needs_floor, cores). Weak keys so
# the memo never pins a frame (gate harnesses churn thousands per round).
_FLOOR_VERDICTS: "weakref.WeakKeyDictionary[DataFrame, tuple[bool, int]]" = (
    weakref.WeakKeyDictionary()
)

# Logical-plan node classes whose presence means the frame already reaches
# shuffle width (or explicitly chose its own partitioning). Simple class names
# of org.apache.spark.sql.catalyst.plans.logical nodes — matched EXACTLY
# against getClass().getSimpleName(), never against rendered plan text.
_SHUFFLE_NODE_CLASSES = frozenset(
    {
        "Join",
        "Aggregate",
        "Window",
        "WindowGroupLimit",
        "Sort",
        "Repartition",
        "RepartitionByExpression",
        "RebalancePartitions",
        "Deduplicate",
        "DeduplicateWithinWatermark",
        "Distinct",
        "Intersect",
        "Except",
        "CoGroup",
        "FlatMapGroupsInPandas",
        "FlatMapGroupsWithState",
        "FlatMapCoGroupsInPandas",
        "MapGroups",
        "GlobalLimit",
    }
)


def _logical_rdd_partitions(jplan) -> int | None:
    """Sum of RDD partition counts over the plan's LogicalRDD leaves —
    metadata only, no job. None when the plan has no LogicalRDD leaf (the
    files-based path is then authoritative) or a leaf is unreadable."""
    total = 0
    seen = False
    stack = [jplan]
    try:
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() == "LogicalRDD":
                total += node.rdd().getNumPartitions()
                seen = True
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
    except Exception:
        return None
    return total if seen else None


def _plan_has_shuffle_node(jplan) -> bool:
    """Depth-first walk of a JVM logical plan: True iff any node's simple
    class name is a shuffle-inducing operator. Subquery expressions can't
    hide a shuffle that affects THIS frame's scan width, so only the main
    operator tree is walked."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name.endswith("$"):  # Scala object classes render with a $ suffix
            name = name[:-1]
        if name in _SHUFFLE_NODE_CLASSES:
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False
