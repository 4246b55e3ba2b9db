"""Tests for sources/compaction.py: plan math, data preservation, partition
layout preservation, and the no-op path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.sources.compaction import (
    compact_table,
    plan_compaction,
)


def _data_files(d):
    out = []
    for dirpath, _, files in os.walk(d):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


@pytest.fixture()
def fragmented_table(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10000).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    ).repartition(32).write.parquet(path)
    return path


def test_plan_counts_files_and_bytes(fragmented_table):
    plans = plan_compaction(fragmented_table, target_bytes=1 << 30)
    assert len(plans) == 1
    p = plans[0]
    assert p.n_files == 32 and p.n_target == 1 and p.worthwhile
    assert p.total_bytes == sum(os.path.getsize(f) for f in _data_files(fragmented_table))


def test_compact_preserves_data(spark, fragmented_table):
    before = sorted(r.id for r in spark.read.parquet(fragmented_table).collect())
    executed = compact_table(spark, fragmented_table, target_bytes=1 << 30)
    assert len(executed) == 1
    assert len(_data_files(fragmented_table)) == 1
    after = sorted(r.id for r in spark.read.parquet(fragmented_table).collect())
    assert after == before
    # second pass is a no-op: already at target
    assert compact_table(spark, fragmented_table, target_bytes=1 << 30) == []


def test_partitioned_table_compacts_per_partition(spark, tmp_path):
    path = str(tmp_path / "parted")
    (
        spark.range(9000)
        .select(F.col("id"), (F.col("id") % 3).alias("part"))
        .repartition(8)
        .write.partitionBy("part")
        .parquet(path)
    )
    plans = plan_compaction(path, target_bytes=1 << 30)
    assert len(plans) == 3 and all(p.worthwhile for p in plans)
    before = sorted((r.id, r.part) for r in spark.read.parquet(path).collect())
    compact_table(spark, path, target_bytes=1 << 30)
    # one file per partition dir, hive layout intact, data identical
    plans2 = plan_compaction(path, target_bytes=1 << 30)
    assert [p.n_files for p in plans2] == [1, 1, 1]
    assert sorted(os.path.basename(p.directory) for p in plans2) == [
        "part=0", "part=1", "part=2"
    ]
    after = sorted((r.id, r.part) for r in spark.read.parquet(path).collect())
    assert after == before


def test_target_bytes_splits_output(spark, tmp_path):
    path = str(tmp_path / "split")
    spark.range(50000).repartition(16).write.parquet(path)
    total = plan_compaction(path, target_bytes=1 << 30)[0].total_bytes
    target = total // 4 + 1
    compact_table(spark, path, target_bytes=target)
    n = len(_data_files(path))
    assert 2 <= n <= 4  # ceil splits at the target, coalesce may undershoot by size skew


def test_bad_target_raises(fragmented_table):
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(fragmented_table, target_bytes=0)
