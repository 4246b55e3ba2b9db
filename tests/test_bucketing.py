"""Bucketing tests: co-bucketed joins and bucket-key aggregations compile to
zero-Exchange plans; results equal the plain-join results."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.sources import bucketing


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    bucketing.write_bucketed(a, "t_bucket_a", ["k"], 8, sort_cols=["k"])
    bucketing.write_bucketed(b, "t_bucket_b", ["k"], 8, sort_cols=["k"])
    yield (
        bucketing.read_table(spark, "t_bucket_a"),
        bucketing.read_table(spark, "t_bucket_b"),
    )
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = ta.join(tb, "k")
        plan = _plan(joined)
        assert not re.search(r"^\(\d+\) Exchange", plan, flags=re.M), plan
        # and the join result is correct
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
    plan = _plan(agg)
    assert not re.search(r"^\(\d+\) Exchange", plan, flags=re.M), plan
    assert agg.count() == 10000


def test_bucketed_results_equal_plain(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = ta.join(tb, "k").agg(F.sum(F.col("va") + F.col("vb"))).first()[0]
    expect = sum(i * 2 + i * 3 for i in range(5000))
    assert got == expect
