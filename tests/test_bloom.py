"""Bloom-filter semi-join reduction (operators/bloom.py): probe
correctness (no false negatives, FP-only errors), distributed build vs a
Python-set replica, pruning effectiveness, and the plan contract — the
probe filter sits on the fact side BELOW the sort-merge join so the
Exchange shuffles only the pruned rows."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import bloom as B
from payroll_etl_fastapi_spark.plans.suite import QUERIES
import payroll_etl_fastapi_spark.plans.suite_bloom  # noqa: F401  (registers)
from tests.conftest import SF_ORACLE


def _py_positions(key: str, bits: int, hashes: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"bf{h}:{key}".encode()).hexdigest()[:7], 16) % bits
        for h in range(hashes)
    ]


def test_build_matches_python_replica(spark):
    keys = spark.createDataFrame([(k,) for k in range(200)], "k long")
    bits, hashes = 1024, 5
    words = B.bloom_build(keys, "k", bits=bits, hashes=hashes)
    expect = [0] * (bits // 64)
    for k in range(200):
        for pos in _py_positions(str(k), bits, hashes):
            expect[pos >> 6] |= 1 << (pos & 63)
    # Python ints are unsigned; Spark longs are two's-complement
    assert words == [w - (1 << 64) if w >= 1 << 63 else w for w in expect]


def test_probe_has_no_false_negatives_and_only_fp_errors(spark):
    keys = spark.createDataFrame([(k,) for k in range(0, 400, 2)], "k long")
    # deliberately tiny filter -> false positives guaranteed, never negatives
    bits, hashes = 256, 3
    words = B.bloom_build(keys, "k", bits=bits, hashes=hashes)
    probe = spark.createDataFrame([(k,) for k in range(400)], "k long")
    passed = {
        r.k
        for r in probe.filter(
            B.bloom_might_contain(F.col("k"), words, bits=bits, hashes=hashes)
        ).collect()
    }
    members = set(range(0, 400, 2))
    assert members <= passed  # every member passes
    assert passed - members  # the undersized filter does produce FPs


def test_null_key_is_filtered_like_inner_join(spark):
    keys = spark.createDataFrame([(1,), (2,)], "k long")
    words = B.bloom_build(keys, "k", bits=256, hashes=3)
    probe = spark.createDataFrame([(1,), (None,)], "k long")
    got = probe.filter(
        B.bloom_might_contain(F.col("k"), words, bits=256, hashes=3)
    ).collect()
    assert [r.k for r in got] == [1]


def test_gate_prunes_fact_side_before_merge_join(spark):
    df = QUERIES["join_bloom_filtered"](spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # the probe (salted-md5 chain) runs in a Filter on the orders scan,
    # i.e. below the join -- the node list shows Filter(...md5(bf...))
    m = re.findall(r"^\(\d+\) Filter", plan, flags=re.M)
    assert m, "no Filter nodes in plan"
    assert "bf0:" in plan and "bf4:" in plan

    # and it actually prunes: ~5% of orders match nation-7 customers
    from payroll_etl_fastapi_spark.plans.suite import _t

    cust = (
        _t(spark, SF_ORACLE, "customer")
        .filter(F.col("c_nationkey") == 7)
        .select("c_custkey")
    )
    words = B.bloom_build(cust, "c_custkey")
    orders = _t(spark, SF_ORACLE, "orders")
    total = orders.count()
    kept = orders.filter(
        B.bloom_might_contain(F.col("o_custkey"), words)
    ).count()
    true_matches = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_semi").count()
    )
    assert kept >= true_matches
    assert kept < total * 0.10  # default sizing keeps FPs negligible here


def test_bloom_fpr_tracks_theory(spark):
    """FPR floor from tools/sketch_quality.py (round 7): over the sf0.01
    customer keys, absent-key probes must false-positive at (1-e^(-kn/m))^k
    within 2x — a salted-hash bug (correlated positions, wrong modulus)
    inflates this decisively while every membership gate stays green."""
    import math

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import bloom as B

    members = spark.read.parquet(
        "/root/testdata/sf0.01/customer.parquet"
    ).select(F.col("c_custkey").alias("k"))
    n = members.distinct().count()
    words = B.bloom_build(members, "k")
    absent = spark.range(50_000).select((F.col("id") + 1_000_000_000).alias("k"))
    fp = absent.filter(B.bloom_might_contain(F.col("k"), words)).count()
    theory = (1.0 - math.exp(-B.BLOOM_HASHES * n / B.BLOOM_BITS)) ** B.BLOOM_HASHES
    assert fp / 50_000 <= max(2 * theory, 0.001)
    # members never false-negative — structural
    misses = members.filter(~B.bloom_might_contain(F.col("k"), words)).count()
    assert misses == 0
