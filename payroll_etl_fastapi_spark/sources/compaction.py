"""Small-file compaction for parquet tables — the maintenance pass every
long-lived 100 TB warehouse needs: streaming sinks, frequent upserts, and
over-parallel writes each leave behind files far below the efficient scan
size, and scan cost degrades linearly with file COUNT (task scheduling,
footer reads, no intra-file parallelism to amortize) rather than bytes.

The reference never meets this problem (a single Postgres heap;
/root/reference/src/etl.py:15 rewrites one table in one transaction); on a
file-based warehouse it is a first-class operator.

Design:
- ``plan_compaction`` is a pure inspection: file listing → per-partition-dir
  byte totals → target file counts at ``target_bytes``. Local ``os.walk``
  here; the listing is the only environment-specific line (HDFS/S3 listing
  at scale) and is O(files), driver-side, no Spark job.
- ``compact_table`` rewrites only the directories the plan says benefit
  (observed files > target): read → ``coalesce(n_target)`` → write-then-swap
  (the same crash-safe swap as etl._write). coalesce, not repartition: a
  compaction must MERGE partitions without a shuffle — the data was already
  correctly placed, we only change its file granularity.
- Partitioned tables compact per partition directory, preserving the
  partition column layout (each directory is rewritten independently, so a
  crash mid-compaction leaves every partition complete, old or new).
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession

__all__ = ["CompactionPlan", "plan_compaction", "compact_table"]

_DATA_EXT = ".parquet"
_DEFAULT_TARGET = 128 * 1024 * 1024


@dataclass(frozen=True)
class CompactionPlan:
    """One directory's compaction decision."""

    directory: str        # absolute path of the leaf data directory
    n_files: int          # current data file count
    total_bytes: int      # current data bytes
    n_target: int         # file count after compaction
    worthwhile: bool      # n_files > n_target — rewriting buys something


def _leaf_dirs(root: str) -> list[str]:
    """Leaf directories holding parquet data files (the table root itself for
    unpartitioned tables, the deepest partition dirs otherwise)."""
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(_DATA_EXT) for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def plan_compaction(
    table_path: str, target_bytes: int = _DEFAULT_TARGET
) -> list[CompactionPlan]:
    """Inspect ``table_path`` and decide, per leaf directory, how many files
    it should hold at ``target_bytes`` per file. Pure metadata — no Spark."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    plans = []
    for d in _leaf_dirs(table_path):
        files = [
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(_DATA_EXT)
        ]
        total = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(total / target_bytes))
        plans.append(
            CompactionPlan(
                directory=d,
                n_files=len(files),
                total_bytes=total,
                n_target=n_target,
                worthwhile=len(files) > n_target,
            )
        )
    return plans


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_bytes: int = _DEFAULT_TARGET,
) -> list[CompactionPlan]:
    """Rewrite every worthwhile leaf directory of ``table_path`` down to its
    planned file count. Returns the executed plans (worthwhile only).

    Each directory is read and rewritten independently with
    ``coalesce(n_target)`` (merge-only, no shuffle) and swapped in with the
    crash-safe rename dance: at any instant a complete copy of the
    directory's data exists at either the live path or its ``__old`` twin.
    """
    executed = []
    for plan in plan_compaction(table_path, target_bytes):
        if not plan.worthwhile:
            continue
        d = plan.directory
        tmp, old = d + "__compact_tmp", d + "__old"
        (
            spark.read.parquet(d)
            .coalesce(plan.n_target)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(d, old)
        os.rename(tmp, d)
        shutil.rmtree(old)
        executed.append(plan)
    return executed
