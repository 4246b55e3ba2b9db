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


@pytest.fixture()
def parted_table(spark, tmp_path):
    path = str(tmp_path / "parted_rec")
    (
        spark.range(3000)
        .select(F.col("id"), (F.col("id") % 3).alias("part"))
        .repartition(4)
        .write.partitionBy("part")
        .parquet(path)
    )
    return path


def test_scratch_dirs_invisible_to_readers(spark, parted_table):
    """Swap scratch dirs are dot-prefixed, so a reader that lists the table
    root MID-COMPACTION (or after a crash) must not see them as extra
    partitions or extra rows — the ADVICE r2 bug was `part=0__compact_tmp`
    showing up as a bogus partition value and doubling rows."""
    import shutil

    n = spark.read.parquet(parted_table).count()
    leaf = os.path.join(parted_table, "part=0")
    # simulate an in-flight compaction: a complete scratch copy beside the leaf
    shutil.copytree(leaf, os.path.join(parted_table, ".part=0__compact_tmp"))
    shutil.copytree(leaf, os.path.join(parted_table, ".part=0__old"))
    got = spark.read.parquet(parted_table)
    assert got.count() == n
    assert sorted(r.part for r in got.select("part").distinct().collect()) == [0, 1, 2]


def test_recover_cleans_stale_scratch(spark, parted_table):
    import shutil

    before = sorted((r.id, r.part) for r in spark.read.parquet(parted_table).collect())
    leaf = os.path.join(parted_table, "part=0")
    shutil.copytree(leaf, os.path.join(parted_table, ".part=0__compact_tmp"))
    shutil.copytree(leaf, os.path.join(parted_table, ".part=1__old"))
    plans = plan_compaction(parted_table, target_bytes=1 << 30)
    # leftovers cleaned, plan sees exactly the three live partitions
    assert sorted(os.path.basename(p.directory) for p in plans) == [
        "part=0", "part=1", "part=2"
    ]
    assert not os.path.exists(os.path.join(parted_table, ".part=0__compact_tmp"))
    assert not os.path.exists(os.path.join(parted_table, ".part=1__old"))
    after = sorted((r.id, r.part) for r in spark.read.parquet(parted_table).collect())
    assert after == before


def test_recover_rolls_back_half_swapped_partition(spark, parted_table):
    """Crash between the two swap renames: live leaf missing, `.X__old` holds
    the only complete copy — recovery must rename it back, losing nothing."""
    before = sorted((r.id, r.part) for r in spark.read.parquet(parted_table).collect())
    leaf = os.path.join(parted_table, "part=2")
    os.rename(leaf, os.path.join(parted_table, ".part=2__old"))
    plans = plan_compaction(parted_table, target_bytes=1 << 30)
    assert sorted(os.path.basename(p.directory) for p in plans) == [
        "part=0", "part=1", "part=2"
    ]
    after = sorted((r.id, r.part) for r in spark.read.parquet(parted_table).collect())
    assert after == before
