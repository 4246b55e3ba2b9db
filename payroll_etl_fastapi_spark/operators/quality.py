"""Data-quality constraint checks — the dbt-test / Delta CHECK-constraint
analog: declarative rules evaluated in ONE aggregate pass, returning a
violation count per rule instead of failing row-by-row.

The reference enforces integrity with Postgres DDL (PRIMARY KEY, UNIQUE,
NOT NULL, FK — /root/reference/src/models.py:7-32); Spark enforces nothing
at write time, so a file warehouse needs the audit expressed as a query.

Scale shape: every rule compiles to a conditional aggregate over one scan —
N rules cost one pass, not N (the naive loop re-scans per rule). The two
non-row-local rules have their own bounded shapes:
- ``unique``: one groupBy on the key columns counting groups with >1 row —
  a single shuffle on the key, the same exchange any dedup pays;
- ``foreign_key``: a left-anti join against the (broadcast when small)
  parent key set — violations are orphans.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "Rule",
    "not_null",
    "in_range",
    "matches",
    "check",
    "observed_check",
    "unique",
    "foreign_key",
]


@dataclass(frozen=True)
class Rule:
    """One row-local constraint: name + boolean 'row is valid' expression."""

    name: str
    valid: Column = field(compare=False)


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo: float, hi: float) -> Rule:
    """Closed-interval range check; NULLs pass (pair with not_null to
    reject them) — the SQL three-valued-logic convention CHECK uses."""
    c = F.col(col)
    return Rule(
        f"range_{col}", c.isNull() | ((c >= F.lit(lo)) & (c <= F.lit(hi)))
    )


def matches(col: str, pattern: str) -> Rule:
    """Regex full-row check; NULLs pass, like SQL CHECK."""
    c = F.col(col)
    return Rule(f"matches_{col}", c.isNull() | c.rlike(pattern))


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """(rule, n_rows, n_violations) for every row-local rule — ONE scan,
    one ungrouped aggregate, regardless of how many rules are checked."""
    if not rules:
        raise ValueError("no rules given")
    # coalesce: F.sum over zero rows is NULL, and an empty table must audit
    # as 0 violations, not NULL (None != 0 would fail a health gate)
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.when(r.valid, 0).otherwise(1)), F.lit(0)).alias(r.name)
        for r in rules
    ]
    wide = df.agg(*aggs)
    per_rule = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col("n_rows").alias("n_rows"),
                F.col(r.name).alias("n_violations"),
            )
            for r in rules
        ]
    )
    return wide.select(F.explode(per_rule).alias("r")).select("r.*")


def observed_check(df: DataFrame, rules: Sequence[Rule]):
    """Attach ``check()``'s audit aggregates as OBSERVED METRICS on the main
    job (``Dataset.observe``): returns ``(observed_df, observation)`` where
    ``observed_df`` is ``df`` with the metrics piggybacked — build the real
    query on top of it, run its action, then read ``observation.get``
    ({'n_rows': ..., '<rule>': violations...}).

    Why this exists at 100 TB: ``check()`` is a second full scan; observe
    rides the SAME scan the business query already pays for — audit metrics
    become free. The trade: metrics arrive on the driver as one tiny dict
    (accumulator-style, one row of aggregates), not as a DataFrame, and
    distinct aggregates are not allowed in observed expressions (Spark
    contract) — uniqueness audits stay on the ``unique()`` path."""
    from pyspark.sql import Observation

    if not rules:
        raise ValueError("no rules given")
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.when(r.valid, 0).otherwise(1)), F.lit(0)).alias(r.name)
        for r in rules
    ]
    return df.observe(obs, *aggs), obs


def unique(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(n_keys, n_duplicate_keys, n_excess_rows): how badly the candidate
    key fails. One shuffle on the key columns."""
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_duplicate_keys"),
        F.coalesce(
            F.sum(F.when(F.col("n") > 1, F.col("n") - 1).otherwise(0)), F.lit(0)
        ).alias("n_excess_rows"),
    )


def foreign_key(
    child: DataFrame, child_keys: Sequence[str], parent: DataFrame,
    parent_keys: Sequence[str],
) -> DataFrame:
    """(n_rows, n_orphans): child rows whose key has no parent. Left-anti
    join against the parent key projection (broadcast when small; NULL child
    keys count as orphans only if the anti-join says so — SQL FK semantics
    would skip NULLs, so they are excluded explicitly)."""
    pairs = list(zip(child_keys, parent_keys))
    sel = child.select(*[F.col(c) for c in child_keys])
    non_null = sel
    for c in child_keys:
        non_null = non_null.filter(F.col(c).isNotNull())
    orphans = non_null.join(
        parent.select(*[F.col(p).alias(c) for c, p in pairs]).distinct(),
        on=list(child_keys),
        how="left_anti",
    )
    return child.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def k_anonymity(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """(quasi..., class_size): the equivalence classes over the
    quasi-identifier tuple that hold FEWER than ``k`` rows — each one a
    re-identification risk under the k-anonymity privacy model (Sweeney
    2002): a released row in a class of size < k narrows a linking attacker
    to fewer than k candidates. The privacy-side complement of the PII
    scrubber (operators/corpus.py): scrubbing removes direct identifiers,
    this audits the QUASI-identifiers that remain.

    One grouped count on the quasi tuple (map-side combine), one filter —
    the audit costs the same as any rollup at 100 TB; callers generalize
    (coarsen bins, drop a column) and re-run until the report is empty."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )


def l_diversity(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str, l: int
) -> DataFrame:
    """(quasi..., class_size, n_sensitive): the equivalence classes over the
    quasi-identifier tuple whose SENSITIVE attribute takes FEWER than ``l``
    distinct values — the homogeneity-attack gap k-anonymity leaves open
    (Machanavajjhala 2007): a class can hold k rows yet disclose everyone's
    sensitive value when all k agree on it. Run AFTER k_anonymity passes;
    a class failing here needs generalization or suppression even though it
    is large enough.

    One grouped (count, exact count-distinct) on the quasi tuple — the
    count-distinct expands to Spark's two-phase exact plan (partial
    aggregation on (quasi, sensitive), then the class rollup); no joins,
    no windows, same 100 TB cost class as any distinct-count rollup."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_micro: int | None = None,
) -> DataFrame:
    """(quasi..., class_size, emd_micro, tvd_micro): per-equivalence-class
    distance between the class's SENSITIVE-value distribution and the
    corpus-global one — the skewness-attack gap l-diversity leaves open
    (Li, Li & Venkatasubramanian 2007): a class can hold l distinct
    sensitive values yet still leak (90% of one disease in a class vs 1%
    globally shifts an attacker's prior enormously). Completes the privacy
    quartet: PII scrub → k-anonymity → l-diversity → t-closeness.

    Two metrics per class, both integer-exact end to end so the SQL oracle
    replays them bit-for-bit:
    - ``emd_micro``: ordered earth-mover's distance in micro-units — each
      per-value probability gap snaps to integer micros FIRST
      (floor(x*1e6 + 0.5), one exact-int division per side), then the
      running prefix sum over the GLOBAL value order accumulates exact
      integers and Σ|cumulative| div (m−1) normalizes. The right metric
      for ordered sensitives (salary bins, ages).
    - ``tvd_micro``: total variation distance Σ|gap| div 2 — ordered EMD
      with a uniform ground distance, the categorical-sensitive metric.

    ``t_micro`` filters to classes whose EMD exceeds it (None = report
    every class — audit mode).

    Scale shape (100 TB): one (quasi, value) grouped count (map-side
    combine), one per-value global rollup (m rows — broadcast), a dense
    class x value grid built by cross-joining the CLASS rollup with the
    broadcast value list (absent combinations must contribute their full
    negative gap — a join-only formulation would silently skip them), and
    one per-class window prefix sum over m rows. No corpus-sized shuffle
    beyond the first rollup."""
    q = list(quasi_cols)
    counts = df.groupBy(*q, sensitive_col).agg(F.count(F.lit(1)).alias("n_cv"))
    classes = counts.groupBy(*q).agg(F.sum("n_cv").alias("class_size"))
    glob = (
        df.groupBy(sensitive_col)
        .agg(F.count(F.lit(1)).alias("g_v"))
        .crossJoin(F.broadcast(df.select(F.count(F.lit(1)).alias("n_total"))))
    )
    m_vals = glob.count()
    grid = classes.crossJoin(F.broadcast(glob))
    joined = grid.join(counts, [*q, sensitive_col], "left").select(
        *q,
        "class_size",
        F.col(sensitive_col).alias("__v"),
        F.coalesce(F.col("n_cv"), F.lit(0)).alias("n_cv"),
        "g_v",
        "n_total",
    )
    gap = (
        F.col("n_cv").cast("double") / F.col("class_size").cast("double")
        - F.col("g_v").cast("double") / F.col("n_total").cast("double")
    )
    snapped = joined.withColumn(
        "gap_micro", F.floor(gap * F.lit(1e6) + F.lit(0.5)).cast("long")
    )
    w = (
        Window.partitionBy(*q)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = snapped.withColumn("cum_micro", F.sum("gap_micro").over(w))
    # integer `div` keeps both engines exact: a double division + CAST
    # would truncate in Spark but ROUND in DuckDB
    out = (
        cum.groupBy(*q, "class_size")
        .agg(
            F.expr(
                f"CAST(sum(abs(cum_micro)) div {max(m_vals - 1, 1)} AS BIGINT)"
            ).alias("emd_micro"),
            F.expr("CAST(sum(abs(gap_micro)) div 2 AS BIGINT)").alias(
                "tvd_micro"
            ),
        )
    )
    if t_micro is not None:
        out = out.filter(F.col("emd_micro") > int(t_micro))
    return out


# ks_drift exact-int64 headroom: ks_num <= n_a*n_b, so ks_num*1e6 stays under
# 2^63 exactly when n_a*n_b <= (2^63-1) div 1e6. Module-level so tests can
# exercise the guard without forging 3e6-row sides.
_KS_HEADROOM = (2**63 - 1) // 1_000_000


def ks_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    side_col: str,
    bin_col: str,
) -> DataFrame:
    """(key..., n_a, n_b, ks_micro): per-key two-sample Kolmogorov-Smirnov
    distance between the value distributions of the two SIDES (side_col
    boolean: true = snapshot A, false = B) — the drift monitor a training
    pipeline runs between ingestion waves before a shifted corpus
    poisons a run. EXACT-INTEGER KS: with cumulative counts cumA/cumB
    over the ordered bins, max |cumA*nB - cumB*nA| is computed in exact
    int64 and reported as ks_micro = that maximum * 1e6 div (nA*nB) — no
    float CDFs, no snapping compromise, bit-replayable in SQL. int64
    headroom: nA*nB*1e6 must stay under 2^63 — fine through ~3e6 rows
    per side per key; a key exceeding it raises a raise_error naming the
    key sizes and the shard-by-time remedy instead of returning a silently
    wrong ks_micro (ADVICE r9; headroom constant: _KS_HEADROOM).

    Keys where either side is EMPTY are reported with ks_micro = -1
    (sentinel: drift undefined, not zero — a vanished side IS a drift
    signal a caller must handle explicitly).

    Scale shape (100 TB): one (key, bin, side) grouped count (map-side
    combine), a per-(key, bin) pivot to (a, b) counts, one per-key window
    prefix sum over the observed bins, one per-key max. No dense grid is
    needed: the CDF gap is constant between observed bins, so scanning
    only observed bins finds the same maximum."""
    q = list(key_cols)
    counts = (
        df.groupBy(*q, bin_col)
        .agg(
            F.sum(F.when(F.col(side_col), 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col(side_col), 0).otherwise(1)).alias("b"),
        )
    )
    # per-key totals come from a FULL-frame window over the SAME per-key
    # partitioning as the prefix sums — a groupBy+join formulation would
    # re-derive counts' lineage for the totals branch and scan the source
    # TWICE (caught by tests/test_plan_shapes.py)
    w = (
        Window.partitionBy(*q)
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = Window.partitionBy(*q).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gap = counts.select(
        *q,
        F.sum("a").over(wfull).alias("n_a"),
        F.sum("b").over(wfull).alias("n_b"),
        F.abs(
            F.sum("a").over(w) * F.sum("b").over(wfull)
            - F.sum("b").over(w) * F.sum("a").over(wfull)
        ).alias("g"),
    )
    return (
        gap.groupBy(*q, "n_a", "n_b")
        .agg(F.max("g").alias("ks_num"))
        .select(
            *q,
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                # overflow guard FIRST (compared via div so the check
                # itself cannot overflow): ks_num <= n_a*n_b, so the
                # product bound is exactly the *1e6 headroom bound
                F.when(
                    F.expr(f"n_a > {_KS_HEADROOM} div n_b"),
                    F.expr(
                        "raise_error(concat('ks_drift: n_a*n_b = ', "
                        "CAST(n_a AS STRING), '*', CAST(n_b AS STRING), "
                        "' exceeds the exact-int64 headroom "
                        f"({_KS_HEADROOM}, ~3e6 rows/side/key); "
                        "shard the key by time first'))"
                    ).cast("long"),
                ).otherwise(
                    F.expr("CAST(ks_num * 1000000 div (n_a * n_b) AS BIGINT)")
                ),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("ks_micro"),
        )
    )


def psi_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    side_col: str,
    bin_col: str,
) -> DataFrame:
    """(key..., n_a, n_b, psi_micro): per-key Population Stability Index
    between the two SIDES (side_col boolean: true = snapshot A) — the
    industry-standard drift score next to the KS distance (ks_drift):
    PSI = sum over bins of (pA - pB) * ln(pA / pB). Where KS reports the
    single worst CDF gap, PSI integrates shift across every bin, so a
    broad low-level redistribution that KS under-reads still scores.
    Conventional reading: < 0.10 (100000 micro) stable, 0.10-0.25
    moderate, > 0.25 action.

    Zero-count bins would make ln blow up; the standard remedy here is
    add-one (Laplace) smoothing over the key's OBSERVED bin set:
    pX_i = (x_i + 1) / (nX + B) with B = observed bins for the key —
    deterministic, no epsilon knob, and a bin present on one side only
    contributes a finite, honest term.

    Determinism: per-bin terms are non-negative ((p-q)ln(p/q) >= 0) and
    snap to integer micros BEFORE the per-key sum (integer sums commute —
    the aggregation-order-proof pattern); probabilities and the ln ratio
    are computed from the same exact doubles in both engines, ln being the
    one non-correctly-rounded step the micro snap absorbs (the
    unigram-cost precedent). Keys with an EMPTY side report psi_micro = -1
    (drift undefined, not zero — the ks_drift sentinel convention).

    Scale shape (100 TB): identical to ks_drift — one (key, bin, side)
    grouped count with map-side combine, per-key totals and bin counts
    from ONE full-frame window over the same partitioning, one grouped
    sum. Observed bins only; no dense grid."""
    q = list(key_cols)
    counts = df.groupBy(*q, bin_col).agg(
        F.sum(F.when(F.col(side_col), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col(side_col), 0).otherwise(1)).alias("b"),
    )
    wfull = Window.partitionBy(*q).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per = counts.select(
        *q,
        F.sum("a").over(wfull).alias("n_a"),
        F.sum("b").over(wfull).alias("n_b"),
        F.count(F.lit(1)).over(wfull).alias("n_bins"),
        F.col("a"),
        F.col("b"),
    )
    pa = (F.col("a") + 1).cast("double") / (F.col("n_a") + F.col("n_bins")).cast(
        "double"
    )
    pb = (F.col("b") + 1).cast("double") / (F.col("n_b") + F.col("n_bins")).cast(
        "double"
    )
    ratio = (
        (F.col("a") + 1).cast("double") * (F.col("n_b") + F.col("n_bins")).cast("double")
    ) / (
        (F.col("b") + 1).cast("double") * (F.col("n_a") + F.col("n_bins")).cast("double")
    )
    term = F.floor((pa - pb) * F.log(ratio) * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        per.groupBy(*q, "n_a", "n_b")
        .agg(F.sum(term).alias("psi_sum"))
        .select(
            *q,
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0), F.col("psi_sum")
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("psi_micro"),
        )
    )
