"""Tests: salted plan rewrites are result-equal to their unsalted forms;
catalog introspection reports tables, columns, and partition layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import skew
from payroll_etl_fastapi_spark.sources import catalog
from payroll_etl_fastapi_spark.sources.registry import load_table

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def skewed_df(spark):
    # one hot key (0) with 5000 rows, 50 cold keys with 10 each
    hot = spark.range(5000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(500).select((F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_sum_equals_plain(skewed_df):
    plain = {
        (r.k,): r.total
        for r in skewed_df.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    salted = {
        (r.k,): r.total
        for r in skew.salted_sum(skewed_df, ["k"], {"v": "total"}, salt_buckets=8).collect()
    }
    assert salted == plain


def test_replicated_salt_join_equals_plain(spark, skewed_df):
    small = spark.range(51).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 100).alias("w")
    )
    plain = skewed_df.join(small, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).first()
    salted = skew.replicated_salt_join(skewed_df, small, "k", salt_buckets=8).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).first()
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_key_histogram_finds_hot_key(skewed_df):
    top = skew.key_histogram(skewed_df, "k", top=3).collect()
    assert top[0].k == 0 and top[0].n == 5000


def test_catalog_tables_and_columns(spark):
    from payroll_etl_fastapi_spark.sources.registry import register_views

    register_views(spark, SF_SMALL)
    tables = catalog.list_tables(spark)
    assert {"nation", "orders", "lineitem", "documents"} <= set(tables)
    cols = {c["name"] for c in catalog.describe_columns(spark, "nation")}
    assert {"n_nationkey", "n_name"} <= cols


def test_physical_layout_counts_files(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    layout = catalog.physical_layout(li).collect()
    assert sum(r.n_rows for r in layout) == li.count()
    assert all(r.file.endswith(".parquet") for r in layout)


def test_partition_values_on_warehouse(spark, tmp_path, reference_csv):
    from payroll_etl_fastapi_spark.etl import PayrollWarehouse

    wh = PayrollWarehouse(spark, str(tmp_path / "wh"))
    wh.load_csv(reference_csv)
    months = catalog.partition_values(wh.root, "fact_payroll", "month")
    assert "2025-05-01" in months and len(months) == 12


def test_replicated_salt_join_rejects_right_and_full(spark, skewed_df):
    small = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("w"))
    for how in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="supports inner/left"):
            skew.replicated_salt_join(skewed_df, small, "k", how=how)
