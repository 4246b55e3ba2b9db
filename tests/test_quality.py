"""Unit tests for operators/quality.py on hand-built frames."""

from __future__ import annotations

import pytest

from payroll_etl_fastapi_spark.operators import quality as Q


def _by_rule(df):
    return {r.rule: (r.n_rows, r.n_violations) for r in df.collect()}


def test_row_local_rules_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (None, -5.0, "ok"), (3, 50.0, "bad!"), (4, None, None)],
        "k int, x double, s string",
    )
    got = _by_rule(
        Q.check(
            df,
            [Q.not_null("k"), Q.in_range("x", 0, 100), Q.matches("s", "^[a-z]+$")],
        )
    )
    assert got == {
        "not_null_k": (4, 1),
        "range_x": (4, 1),        # nulls pass range
        "matches_s": (4, 1),      # nulls pass regex
    }
    with pytest.raises(ValueError, match="no rules"):
        Q.check(df, [])


def test_unique_counts_excess_rows(spark):
    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 1), (2, 1), (3, 1), (3, 2)], "a int, b int"
    )
    r = Q.unique(df, ["a", "b"]).first()
    # keys: (1,1)x3 (2,1) (3,1) (3,2) → 4 keys, 1 duplicated, 2 excess rows
    assert (r.n_keys, r.n_duplicate_keys, r.n_excess_rows) == (4, 1, 2)


def test_foreign_key_orphans_and_null_skip(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = Q.foreign_key(child, ["fk"], parent, ["pk"]).first()
    # 9 is an orphan; NULL fk is skipped per SQL FK semantics
    assert (r.n_rows, r.n_orphans) == (4, 1)


def test_empty_table_audits_zero_not_null(spark):
    empty = spark.createDataFrame([], "k int, x double")
    got = _by_rule(Q.check(empty, [Q.not_null("k"), Q.in_range("x", 0, 1)]))
    assert got == {"not_null_k": (0, 0), "range_x": (0, 0)}
    r = Q.unique(empty, ["k"]).first()
    assert (r.n_keys, r.n_duplicate_keys, r.n_excess_rows) == (0, 0, 0)


def test_observed_check_matches_second_pass_audit(spark):
    """observe-piggybacked metrics must equal the standalone check() pass,
    including the violation positive path and the empty-frame zero fill."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (None, 5.0)], "k long, v double"
    )
    rules = [Q.not_null("k"), Q.in_range("v", 0.0, 50.0)]
    observed, obs = Q.observed_check(df, rules)
    observed.count()  # any action populates the observation
    m = obs.get
    want = {r.rule: (r.n_rows, r.n_violations) for r in Q.check(df, rules).collect()}
    assert m["n_rows"] == 4
    for rule, (_, nv) in want.items():
        assert m[rule] == nv, rule
    assert m["not_null_k"] == 1 and m["range_v"] == 1  # real positives

    empty = spark.createDataFrame([], "k long, v double")
    observed_e, obs_e = Q.observed_check(empty, rules)
    observed_e.count()
    me = obs_e.get
    assert me["n_rows"] == 0 and me["not_null_k"] == 0 and me["range_v"] == 0


def test_k_anonymity_reports_only_small_classes(spark):
    from payroll_etl_fastapi_spark.operators.quality import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)],
        "qa string, qb long",
    )
    got = {
        (r["qa"], r["qb"]): r["class_size"]
        for r in k_anonymity(df, ["qa", "qb"], 5).collect()
    }
    # ('a', 1) has 5 rows — NOT risky at k=5; the others are
    assert got == {("a", 2): 2, ("b", 1): 1}


def test_k_anonymity_empty_report_when_generalized(spark):
    """Coarsening the quasi tuple (dropping qb) empties the report — the
    generalize-and-rerun loop the operator docstring names."""
    from payroll_etl_fastapi_spark.operators.quality import k_anonymity

    df = spark.createDataFrame(
        [("a", 1)] * 3 + [("a", 2)] * 2, "qa string, qb long"
    )
    assert k_anonymity(df, ["qa", "qb"], 5).count() == 2
    assert k_anonymity(df, ["qa"], 5).count() == 0


def test_l_diversity_catches_homogeneous_class_k_anonymity_passes(spark):
    """round 8: a class large enough for k-anonymity but with ONE sensitive
    value fails l-diversity — the homogeneity attack the k-check misses."""
    from payroll_etl_fastapi_spark.operators import quality as Q

    rows = (
        [(1, "d1") for _ in range(10)]            # homogeneous, big class
        + [(2, f"d{i % 4}") for i in range(10)]   # diverse class
        + [(3, "d1"), (3, "d2")]                  # small but diverse
    )
    df = spark.createDataFrame(rows, "quasi int, diag string")
    k_risky = {r.quasi for r in Q.k_anonymity(df, ["quasi"], 5).collect()}
    assert k_risky == {3}  # only the small class fails k
    l_risky = {
        (r.quasi, r.class_size, r.n_sensitive)
        for r in Q.l_diversity(df, ["quasi"], "diag", 3).collect()
    }
    assert l_risky == {(1, 10, 1), (3, 2, 2)}  # class 1 passes k, fails l


# ---------------------------------------------------------------------------
# round 9: t-closeness (the skewness-attack member of the privacy quartet)
# ---------------------------------------------------------------------------


def test_t_closeness_flags_skewed_class_l_diversity_misses(spark):
    """Class A holds 3 distinct sensitive values (l-diverse at l=3) but 90%
    mass on value 0 vs a uniform global — t-closeness flags it while a
    balanced class scores near zero."""
    rows = []
    # class A: 18x v0, 1x v1, 1x v2  (skewed but l-diverse)
    rows += [("A", 0)] * 18 + [("A", 1), ("A", 2)]
    # class B: balanced 10/10/10 - but global is NOT uniform, so compute
    rows += [("B", 0)] * 10 + [("B", 1)] * 10 + [("B", 2)] * 10
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r.grp: r for r in Q.t_closeness(df, ["grp"], "v").collect()}
    assert out["A"].emd_micro > out["B"].emd_micro
    assert out["A"].tvd_micro > out["B"].tvd_micro
    # threshold mode filters
    flagged = Q.t_closeness(df, ["grp"], "v", t_micro=out["B"].emd_micro).collect()
    assert [r.grp for r in flagged] == ["A"]


def test_t_closeness_absent_value_counts_full_gap(spark):
    """A class missing a global value entirely must charge that value's
    whole global probability — a join-only (non-dense-grid) formulation
    would skip it."""
    rows = [("A", 0)] * 10 + [("B", 0)] * 5 + [("B", 1)] * 5
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r.grp: r for r in Q.t_closeness(df, ["grp"], "v").collect()}
    # global: v0=15/20, v1=5/20. A: v0=1.0, v1=0 -> gaps +0.25 / -0.25
    assert out["A"].tvd_micro == 250000
    assert out["A"].emd_micro == 250000  # m-1 = 1, |cum| = 250000


def test_t_closeness_emd_is_order_sensitive_tvd_is_not(spark):
    """Mass displaced FAR along the value order costs more EMD than mass
    displaced to an adjacent value; TVD cannot see the difference."""
    # class 'adj' moves 25% of its mass from v0 to the ADJACENT v1
    # relative to 'base'; class 'jmp' moves the same 25% from v0 all the
    # way to v2 — identical per-value |gap| multiset (same TVD), but the
    # jump crosses two cumulative boundaries (double the EMD).
    base = [("base", 0)] * 8 + [("base", 1)] * 6 + [("base", 2)] * 6
    adj = [("adj", 0)] * 4 + [("adj", 1)] * 10 + [("adj", 2)] * 6
    jmp = [("jmp", 0)] * 4 + [("jmp", 1)] * 6 + [("jmp", 2)] * 10
    df2 = spark.createDataFrame(base + adj + jmp, "grp string, v long")
    o2 = {r.grp: r for r in Q.t_closeness(df2, ["grp"], "v").collect()}
    assert o2["adj"].tvd_micro == o2["jmp"].tvd_micro
    assert o2["jmp"].emd_micro > o2["adj"].emd_micro


def test_ks_drift_detects_planted_shift_exactly(spark):
    """Identical sides -> ks 0; a hard shift (disjoint bins) -> ks 1e6;
    the integer formula matches a scipy-style float KS on a mixed case."""
    same = [("x", True, b) for b in (1, 2, 3)] * 4 + [
        ("x", False, b) for b in (1, 2, 3)
    ] * 4
    hard = [("y", True, 1)] * 6 + [("y", False, 9)] * 6
    df = spark.createDataFrame(
        same + hard, "key string, is_a boolean, bin long"
    )
    out = {r.key: r for r in Q.ks_drift(df, ["key"], "is_a", "bin").collect()}
    assert out["x"].ks_micro == 0
    assert out["y"].ks_micro == 1_000_000
    # mixed: A = {1:3, 2:1}, B = {1:1, 2:3} -> CDF gap at bin1 = 3/4-1/4 = 1/2
    mixed = (
        [("z", True, 1)] * 3 + [("z", True, 2)]
        + [("z", False, 1)] + [("z", False, 2)] * 3
    )
    dfz = spark.createDataFrame(mixed, "key string, is_a boolean, bin long")
    r = Q.ks_drift(dfz, ["key"], "is_a", "bin").collect()[0]
    assert (r.n_a, r.n_b, r.ks_micro) == (4, 4, 500_000)


def test_ks_drift_empty_side_sentinel(spark):
    df = spark.createDataFrame(
        [("only_a", True, 1), ("only_a", True, 2)],
        "key string, is_a boolean, bin long",
    )
    r = Q.ks_drift(df, ["key"], "is_a", "bin").collect()[0]
    assert r.ks_micro == -1 and r.n_b == 0


def test_psi_drift_identical_disjoint_and_replica(spark):
    """Identical sides -> PSI 0; fully disjoint bins -> large PSI; a mixed
    case matches a python replica of the smoothed formula exactly."""
    import math

    same = [("x", True, b) for b in (1, 2, 3)] * 4 + [
        ("x", False, b) for b in (1, 2, 3)
    ] * 4
    hard = [("y", True, 1)] * 6 + [("y", False, 9)] * 6
    mixed = (
        [("z", True, 1)] * 3 + [("z", True, 2)]
        + [("z", False, 1)] + [("z", False, 2)] * 3
    )
    df = spark.createDataFrame(
        same + hard + mixed, "key string, is_a boolean, bin long"
    )
    out = {r.key: r for r in Q.psi_drift(df, ["key"], "is_a", "bin").collect()}
    assert out["x"].psi_micro == 0
    assert out["y"].psi_micro > 1_000_000  # disjoint -> far past 'action'

    def psi(counts):  # [(a, b)] over observed bins
        na, nb, B = sum(a for a, _ in counts), sum(b for _, b in counts), len(counts)
        tot = 0
        for a, b in counts:
            pa, pb = (a + 1) / (na + B), (b + 1) / (nb + B)
            tot += math.floor((pa - pb) * math.log(pa / pb) * 1_000_000 + 0.5)
        return tot

    assert out["z"].psi_micro == psi([(3, 1), (1, 3)])
    assert out["y"].psi_micro == psi([(6, 0), (0, 6)])
    assert (out["z"].n_a, out["z"].n_b) == (4, 4)


def test_psi_drift_one_sided_bins_finite_and_empty_sentinel(spark):
    """Add-one smoothing keeps one-sided bins finite (no inf/NULL), and an
    empty side reports the -1 sentinel (the ks_drift convention)."""
    df = spark.createDataFrame(
        [("k", True, 1), ("k", True, 2), ("k", False, 2)]
        + [("only_a", True, 1)],
        "key string, is_a boolean, bin long",
    )
    out = {r.key: r for r in Q.psi_drift(df, ["key"], "is_a", "bin").collect()}
    assert out["k"].psi_micro >= 0  # finite, smoothed
    assert out["only_a"].psi_micro == -1 and out["only_a"].n_b == 0


def test_ks_drift_headroom_guard_raises(spark, monkeypatch):
    """A key whose n_a*n_b exceeds the exact-int64 headroom must raise a
    named error instead of returning a silently wrong ks_micro (ADVICE r9).
    The headroom is a module constant so the guard can be exercised without
    forging 3e6-row sides."""
    df = spark.createDataFrame(
        [("k", True, 1)] * 5 + [("k", False, 2)] * 5,
        "key string, is_a boolean, bin long",
    )
    monkeypatch.setattr(Q, "_KS_HEADROOM", 20)  # n_a*n_b = 25 > 20
    with pytest.raises(Exception, match="headroom"):
        Q.ks_drift(df, ["key"], "is_a", "bin").collect()
    monkeypatch.setattr(Q, "_KS_HEADROOM", 25)  # exactly at the bound: fine
    r = Q.ks_drift(df, ["key"], "is_a", "bin").collect()[0]
    assert r.ks_micro == 1_000_000
