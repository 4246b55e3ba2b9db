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


def test_hll_linear_counting_fixes_small_range_bias(spark):
    """Accuracy floor from tools/sketch_quality.py (round 7): the raw
    harmonic estimator at true cardinality 31 / m=256 reports ~200 (+540%
    — the documented raw-estimator bias range); the LinearCounting
    correction (Flajolet §4) must land within 15%. In the design range
    (>= 2.5m) corrected == raw exactly."""
    small = spark.createDataFrame([(f"k{i}",) for i in range(31)], "k string")
    regs = SK.hll_registers(small, "k")
    raw = SK.hll_estimate(regs).first().hll_est
    corr = SK.hll_estimate_corrected(regs).first()
    assert raw > 31 * 3  # the bias LinearCounting exists to fix
    assert corr.estimator == "linear_counting"
    assert abs(corr.hll_est - 31) / 31 < 0.15

    big = spark.createDataFrame([(f"u{i}",) for i in range(3000)], "k string")
    bregs = big.transform(lambda d: SK.hll_registers(d, "k")).localCheckpoint()
    braw = SK.hll_estimate(bregs).first().hll_est
    bcorr = SK.hll_estimate_corrected(bregs).first()
    assert bcorr.estimator == "raw"
    assert bcorr.hll_est == braw
    assert abs(braw - 3000) / 3000 < 3 * (1.04 / 16)  # 3x theory RSE at m=256


def test_cms_error_within_contract_on_real_stream(spark):
    """CMS accuracy floor (tools/sketch_quality.py): on the events user_id
    stream, every estimate must be >= truth (structural) and within the
    eps*N = e/width * N Cormode-Muthukrishnan line (theory allows e^-4 ~ 1.8%
    of keys above it; measured 0 at both driver scales)."""
    import math

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        F.col("user_id").cast("string").alias("k")
    ).localCheckpoint()
    n = ev.count()
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("truth"))
    est = SK.cms_estimate(SK.cms_build(ev, "k"), exact.select("k"), "k")
    rows = est.join(exact, "k").collect()
    line = math.e / SK.CMS_WIDTH * n
    viol = 0
    for r in rows:
        assert r.cms_count >= r.truth  # never underestimates — hard
        if r.cms_count - r.truth > line:
            viol += 1
    assert viol / len(rows) <= 0.02  # theory e^-depth = 1.8%


def test_hdr_quantiles_within_hard_relative_bound(spark):
    """HDR accuracy floor: each reported quantile is a LOWER bound on the
    exact percentile within 2^-HDR_MBITS relative — a hard contract of the
    bucket geometry, not a probabilistic one."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("c")
    ).localCheckpoint()
    qs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    sk = SK.hdr_quantiles(SK.hdr_histogram(orders, "c"), qs).first()
    exact = orders.agg(
        *[F.expr(f"percentile(c, {n}/{d})").alias(nm) for nm, n, d in qs]
    ).first()
    bound = 2.0 ** (-SK.HDR_MBITS)
    for nm, _, _ in qs:
        rel_below = (exact[nm] - sk[nm]) / exact[nm]
        assert 0 <= rel_below <= bound, (nm, sk[nm], exact[nm])
