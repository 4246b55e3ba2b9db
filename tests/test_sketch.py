"""Tests for operators.sketch (count-min): over-estimate-only bound,
mergeability, unseen-key behavior, and error within the CMS guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import sketch as SK


def _items(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_bounds_error(spark):
    counts = {f"key{i}": (i % 7) + 1 for i in range(200)}
    counts["hot"] = 500
    items = _items(spark, counts)
    n_total = sum(counts.values())
    sk = SK.cms_build(items, "k")
    # sketch size is bounded by depth*width, independent of input size
    assert sk.count() <= SK.CMS_DEPTH * SK.CMS_WIDTH
    probes = spark.createDataFrame([(k,) for k in counts], "k string")
    est = {r.k: r.cms_count for r in SK.cms_estimate(sk, probes, "k").collect()}
    for k, true in counts.items():
        assert est[k] >= true, (k, est[k], true)
        # CMS guarantee: overestimate ≤ e/width * N with prob 1-exp(-depth);
        # on this fixed corpus just assert a generous deterministic bound
        assert est[k] - true <= 3 * n_total / SK.CMS_WIDTH + 2, (k, est[k], true)
    # the heavy hitter is cleanly identified
    assert est["hot"] >= 500


def test_cms_merge_equals_whole(spark):
    a = _items(spark, {"x": 10, "y": 3})
    b = _items(spark, {"x": 5, "z": 7})
    merged = SK.cms_merge(SK.cms_build(a, "k"), SK.cms_build(b, "k"))
    whole = SK.cms_build(a.unionByName(b), "k")
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    exp = {(r.row, r.bucket): r.cnt for r in whole.collect()}
    assert got == exp


def test_cms_unseen_key_estimates_like_empty_buckets(spark):
    items = _items(spark, {"a": 4})
    sk = SK.cms_build(items, "k")
    probes = spark.createDataFrame([("never-seen-key-xyz",)], "k string")
    est = SK.cms_estimate(sk, probes, "k").collect()[0]
    # an unseen key can only collide into 'a' buckets or empty ones
    assert 0 <= est.cms_count <= 4
