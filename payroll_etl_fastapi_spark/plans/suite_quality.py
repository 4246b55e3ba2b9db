"""Data-quality gate query: the declarative constraint audit
(operators/quality.py) over the orders/lineitem/customer tables, one row per
rule, DuckDB-replayed. The positive path is real: the synthetic lineitem
violates its nominal (orderkey, linenumber) key (discovered building the
txtable gate), so the uniqueness audit reports genuine excess rows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import quality as Q
from payroll_etl_fastapi_spark.plans.suite import _t, query

_PRICE_LO, _PRICE_HI = 0.0, 150000.0


@query(
    "quality_constraint_audit",
    oracle=f"""
    SELECT 'not_null_o_custkey' AS rule,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'range_o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                          AND (o_totalprice < {_PRICE_LO} OR o_totalprice > {_PRICE_HI})
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'matches_o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                          AND NOT regexp_matches(o_orderstatus, '^[OFP]$')
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique_lineitem_pk',
           (SELECT count(*) FROM lineitem),
           CAST((SELECT count(*) FROM lineitem)
                - (SELECT count(*) FROM (
                       SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
                AS BIGINT)
    UNION ALL
    SELECT 'fk_orders_customer',
           (SELECT count(*) FROM orders),
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
    ORDER BY rule
    """,
)
def quality_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five constraints, three operator shapes, one uniform
    (rule, n_rows, n_violations) report:

    - three row-local rules (not-null, range, regex) — ONE conditional
      aggregate pass over orders, N rules per scan;
    - candidate-key uniqueness on lineitem — one shuffle on the key;
    - orders→customer foreign key — left-anti join against the parent keys.

    Scale shape: no rule costs more than the cheapest plan that could
    possibly check it; adding row-local rules is free (same scan)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    row_local = Q.check(
        orders,
        [
            Q.not_null("o_custkey"),
            Q.in_range("o_totalprice", _PRICE_LO, _PRICE_HI),
            Q.matches("o_orderstatus", "^[OFP]$"),
        ],
    )
    uniq = Q.unique(lineitem, ["l_orderkey", "l_linenumber"]).select(
        F.lit("unique_lineitem_pk").alias("rule"),
        (F.col("n_keys") + F.col("n_excess_rows")).alias("n_rows"),
        F.col("n_excess_rows").alias("n_violations"),
    )
    fk = Q.foreign_key(orders, ["o_custkey"], customer, ["c_custkey"]).select(
        F.lit("fk_orders_customer").alias("rule"),
        "n_rows",
        F.col("n_orphans").alias("n_violations"),
    )
    return row_local.unionByName(uniq).unionByName(fk).orderBy("rule")


@query(
    "quality_observed_audit",
    oracle="""
    WITH cents AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT) AS c,
               l_quantity
        FROM lineitem
    ),
    biz AS (
        SELECT 'flag_' || l_returnflag AS k, CAST(sum(c) AS BIGINT) AS v
        FROM cents GROUP BY l_returnflag
    ),
    audit AS (
        SELECT 'audit_n_rows' AS k, CAST(count(*) AS BIGINT) AS v FROM cents
        UNION ALL
        SELECT 'audit_range_l_quantity',
               CAST(sum(CASE WHEN l_quantity IS NOT NULL
                              AND (l_quantity < 1 OR l_quantity > 45)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM cents
        UNION ALL
        SELECT 'audit_not_null_l_returnflag',
               CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM cents
    )
    SELECT k, v FROM biz
    UNION ALL
    SELECT k, v FROM audit
    ORDER BY k
    """,
)
def quality_observed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit metrics for FREE on the business query's own scan
    (operators.quality.observed_check / Dataset.observe): the revenue
    rollup by returnflag runs once, and the not-null + range rules ride
    that same scan as observed metrics — no second audit pass, the shape
    a 100 TB pipeline needs (check() re-scans; observe doesn't).

    The gate output unions the rollup rows with the observation payload
    (both (k, v) BIGINT — cents revenue and violation counts are exact
    integers), so the driver hash covers the BUSINESS answer AND the
    audit values the observation actually delivered; the range rule has a
    real positive path (l_quantity runs 1-50, the rule caps at 45). The
    observation dict is driver-sized by construction (one aggregate row),
    like a sketch collect."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_quantity"
    )
    rules = [
        Q.in_range("l_quantity", 1, 45),
        Q.not_null("l_returnflag"),
    ]
    observed, obs = Q.observed_check(li, rules)
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    rollup = (
        observed.groupBy("l_returnflag")
        .agg(F.sum(cents).alias("v"))
        .select(F.concat(F.lit("flag_"), F.col("l_returnflag")).alias("k"), "v")
    )
    rollup.collect()  # the ONE action that runs business + audit together
    m = obs.get
    metrics = spark.createDataFrame(
        [
            ("audit_n_rows", int(m["n_rows"])),
            ("audit_range_l_quantity", int(m["range_l_quantity"])),
            ("audit_not_null_l_returnflag", int(m["not_null_l_returnflag"])),
        ],
        "k string, v long",
    )
    return rollup.unionByName(metrics).orderBy("k")


_K_ANON = 5


@query(
    "quality_k_anonymity",
    oracle=f"""
    WITH quasi AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bin
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment, bal_bin,
           count(*) AS class_size
    FROM quasi
    GROUP BY c_nationkey, c_mktsegment, bal_bin
    HAVING count(*) < {_K_ANON}
    ORDER BY c_nationkey, c_mktsegment, bal_bin
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators.quality.k_anonymity) over the customer
    quasi-identifiers (nation, market segment, account-balance thousand-bin):
    every equivalence class smaller than k=5 is a re-identification risk the
    release pipeline must generalize away. The bin edge is floor(x/1000) —
    one IEEE divide + floor, bit-identical in both engines.

    Scale shape: exactly one grouped count with map-side combine; the risky
    classes are by definition the SMALL groups, so the report is never
    large even when the table is."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bin"),
    )
    risky = Q.k_anonymity(c, ["c_nationkey", "c_mktsegment", "bal_bin"], _K_ANON)
    return risky.orderBy("c_nationkey", "c_mktsegment", "bal_bin")


# bin 250 / l=4 keeps a positive path at EVERY scale (141/785/48 risky
# classes at sf0.001/0.01/0.1) — the first-cut 1000/3 saturated to zero
# rows at sf0.1 as classes grew, leaving the sweep row trivially empty
_L_DIV = 4
_L_BIN = 250


@query(
    "quality_l_diversity",
    oracle=f"""
    WITH quasi AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / {_L_BIN}) AS BIGINT) AS bal_bin,
               c_mktsegment
        FROM customer
    )
    SELECT c_nationkey, bal_bin,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
    FROM quasi
    GROUP BY c_nationkey, bal_bin
    HAVING count(DISTINCT c_mktsegment) < {_L_DIV}
    ORDER BY c_nationkey, bal_bin
    """,
)
def quality_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (operators.quality.l_diversity): the homogeneity-
    attack gap k-anonymity leaves open (Machanavajjhala 2007) — an
    equivalence class over (nation, balance-bin) can be large enough for
    k-anonymity yet disclose everyone's market segment when fewer than l=4
    distinct segments appear in it. Completes the privacy trio: PII scrub
    (direct identifiers) → k-anonymity (class size) → l-diversity
    (sensitive-value spread). One grouped (count, exact count-distinct)
    rollup — Spark's two-phase exact distinct plan, no joins, no windows;
    the risky classes are the homogeneous ones, so the report stays small
    at any scale (141/785/48 rows at sf0.001/0.01/0.1)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _L_BIN).cast("long").alias("bal_bin"),
        "c_mktsegment",
    )
    risky = Q.l_diversity(c, ["c_nationkey", "bal_bin"], "c_mktsegment", _L_DIV)
    return risky.select(
        "c_nationkey",
        "bal_bin",
        F.col("class_size").cast("long").alias("class_size"),
        F.col("n_sensitive").cast("long").alias("n_sensitive"),
    ).orderBy("c_nationkey", "bal_bin")


def _iqr_oracle() -> str:
    from payroll_etl_fastapi_spark.operators import sketch as SK

    m, lo = SK.HDR_MBITS, 1 << SK.HDR_MBITS
    key = (
        f"CASE WHEN v < {lo} THEN v "
        f"ELSE (length(bin(v)) - 1) * {lo} "
        f"+ ((v >> (length(bin(v)) - 1 - {m})) - {lo}) END"
    )

    def lb(k: str) -> str:
        return (
            f"CAST(CASE WHEN {k} < {lo} THEN {k} "
            f"ELSE (({k} % {lo}) + {lo}) << (({k} // {lo}) - {m}) END AS BIGINT)"
        )

    return f"""
    WITH v AS (
        SELECT event_type,
               CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT) AS v
        FROM events
    ),
    k AS (
        SELECT event_type, {key} AS key, count(*) AS cnt FROM v GROUP BY 1, 2
    ),
    c AS (
        SELECT event_type, key, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY key) AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM k
    ),
    q AS (
        SELECT event_type, CAST(max(n) AS BIGINT) AS n,
               min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN key END) AS k25,
               min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN key END) AS k75
        FROM c GROUP BY event_type
    ),
    f AS (
        SELECT event_type, n,
               {lb('k25')} AS p25,
               {lb('k75')} AS p75,
               {lb('k25')} - (3 * ({lb('k75')} - {lb('k25')})) // 2 AS lo_fence,
               {lb('k75')} + (3 * ({lb('k75')} - {lb('k25')})) // 2 AS hi_fence
        FROM q
    )
    SELECT f.event_type, f.n, f.p25, f.p75, f.lo_fence, f.hi_fence,
           CAST(sum(CASE WHEN v.v < f.lo_fence THEN 1 ELSE 0 END) AS BIGINT)
               AS n_below,
           CAST(sum(CASE WHEN v.v > f.hi_fence THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above
    FROM f JOIN v ON v.event_type = f.event_type
    GROUP BY 1, 2, 3, 4, 5, 6
    ORDER BY f.event_type
    """


@query("quality_iqr_outliers", oracle=_iqr_oracle())
def quality_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per event type, with the quartiles coming
    from the MERGEABLE HDR quantile sketch instead of an exact global sort
    — the composition a 100 TB pipeline actually runs: p25/p75 from the
    bounded log-scale histogram (≤ ~1.9k rows per group at any input
    size), fences p25 ∓ 3·IQR DIV 2 in pure integer arithmetic, then ONE
    more scan counts violations against the broadcast ≤|groups|-row fence
    table. Complements the exact-median MAD anomaly gate (A6, plans/kpi):
    same statistical idea, sketch-scale machinery.

    Everything is integers (cents values, bucket keys, rank targets,
    lower-bound answers, fences, counts), so the oracle replays sketch,
    fences, and violation counts bit-for-bit."""
    from payroll_etl_fastapi_spark.operators import sketch as SK

    e = _t(spark, sf_dir, "events")
    d = e.select(
        "event_type",
        F.floor(F.abs(F.coalesce(F.col("value"), F.lit(0.0))) * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    hist = SK.hdr_histogram(d, "v", ["event_type"])
    q = SK.hdr_quantiles(
        hist, quantiles=[("p25", 1, 4), ("p75", 3, 4)], group_cols=["event_type"]
    )
    iqr15 = F.expr("3 * (p75 - p25) DIV 2")
    fences = q.select(
        "event_type",
        "n",
        "p25",
        "p75",
        (F.col("p25") - iqr15).alias("lo_fence"),
        (F.col("p75") + iqr15).alias("hi_fence"),
    )
    counts = (
        d.join(F.broadcast(fences.select("event_type", "lo_fence", "hi_fence")),
               "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("v") < F.col("lo_fence"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("v") > F.col("hi_fence"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )
    return fences.join(counts, "event_type").orderBy("event_type")


# ---------------------------------------------------------------------------
# in-engine model fitting (round 7): least squares by normal equations
# ---------------------------------------------------------------------------

def _linear_fit_oracle() -> str:
    """SQL replay of operators.regress.linear_fit over the documents quality
    components. The Cramer-solve expressions are the SAME strings Spark
    compiles (regress.SOLVE_EXPRS / DIAG_EXPRS) — one formula source, two
    parsers, identical IEEE op order."""
    from payroll_etl_fastapi_spark.operators import regress as R
    from payroll_etl_fastapi_spark.plans.suite import _sql_r6

    norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    toks = f"string_split({norm}, ' ')"
    dbl_casts = ",\n               ".join(
        f"CAST({src} AS DOUBLE) AS {dst}" for dst, src in R._DBL.items()
    )
    return f"""
    WITH f AS (
        SELECT len({toks})                                        AS x1,
               len(list_filter({toks}, t -> len(t) >= 4))         AS x2,
               len({norm})                                        AS y
        FROM documents
    ),
    sums AS (
        SELECT count(*)                    AS n,
               CAST(sum(x1) AS BIGINT)     AS s1,
               CAST(sum(x2) AS BIGINT)     AS s2,
               CAST(sum(y) AS BIGINT)      AS sy,
               CAST(sum(x1 * x1) AS BIGINT) AS s11,
               CAST(sum(x1 * x2) AS BIGINT) AS s12,
               CAST(sum(x2 * x2) AS BIGINT) AS s22,
               CAST(sum(x1 * y) AS BIGINT)  AS s1y,
               CAST(sum(x2 * y) AS BIGINT)  AS s2y,
               CAST(sum(y * y) AS BIGINT)   AS syy
        FROM f
    ),
    dbl AS (
        SELECT *,
               {dbl_casts}
        FROM sums
    ),
    solved AS (
        SELECT *,
               {R.SOLVE_EXPRS['w1']} AS w1,
               {R.SOLVE_EXPRS['w2']} AS w2,
               {R.SOLVE_EXPRS['w0']} AS w0
        FROM dbl
    )
    SELECT n, s11, s22, syy,
           {_sql_r6('w1')} AS w1,
           {_sql_r6('w2')} AS w2,
           {_sql_r6('w0')} AS w0,
           {_sql_r6(R.DIAG_EXPRS['r2'])} AS r2
    FROM solved
    """


@query("quality_linear_fit", oracle=_linear_fit_oracle())
def quality_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed least-squares fit, in-engine (operators.regress): model
    n_chars ~ w1·n_tokens + w2·n_long_tokens + w0 over the documents
    quality components — the linear-scorer training shape of quality
    filtering (CCNet/fastText-style), done the only way that survives
    100 TB: ONE whole-stage-codegen scan accumulates the exact-integer
    Gram/moment sums with map-side partials (no data shuffle, no
    iterations, no driver loop), and the weights + R² come out in closed
    form (Cramer; SSE via y'y − w'X'y, so diagnostics need no second
    pass). The oracle compiles the IDENTICAL solve-formula strings, which
    is what makes a float model fit hash-comparable across engines."""
    from payroll_etl_fastapi_spark.operators import regress as R
    from payroll_etl_fastapi_spark.operators import text as T
    from payroll_etl_fastapi_spark.plans.suite import _r6

    docs = _t(spark, sf_dir, "documents")
    c = T.quality_components(F.col("text"))
    fit = R.linear_fit(docs, c["n_tokens"], c["n_long_tokens"], c["n_chars"])
    return fit.select(
        "n", "s11", "s22", "syy",
        _r6(F.col("w1")).alias("w1"),
        _r6(F.col("w2")).alias("w2"),
        _r6(F.col("w0")).alias("w0"),
        _r6(F.col("r2")).alias("r2"),
    )


# ---------------------------------------------------------------------------
# t-closeness (round 9) — the skewness-attack member of the privacy family
# ---------------------------------------------------------------------------

_T_BIN = 3000  # balance-bin width for the ordered sensitive attribute


def _t_closeness_oracle(bin_width: int = _T_BIN) -> str:
    return f"""
    WITH src AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / {bin_width}) AS BIGINT) AS bal_bin
        FROM customer
    ),
    counts AS (
        SELECT c_nationkey, bal_bin, count(*) AS n_cv
        FROM src GROUP BY 1, 2
    ),
    classes AS (
        SELECT c_nationkey, sum(n_cv) AS class_size FROM counts GROUP BY 1
    ),
    gdist AS (SELECT bal_bin, count(*) AS g_v FROM src GROUP BY 1),
    tot AS (SELECT count(*) AS n_total FROM src),
    m AS (SELECT greatest(count(*) - 1, 1) AS denom FROM gdist),
    grid AS (
        SELECT c.c_nationkey, c.class_size, g.bal_bin, g.g_v, t.n_total
        FROM classes c, gdist g, tot t
    ),
    j AS (
        SELECT grid.*, coalesce(cn.n_cv, 0) AS n_cv
        FROM grid LEFT JOIN counts cn USING (c_nationkey, bal_bin)
    ),
    snapped AS (
        SELECT *,
               CAST(floor((CAST(n_cv AS DOUBLE) / CAST(class_size AS DOUBLE)
                         - CAST(g_v AS DOUBLE) / CAST(n_total AS DOUBLE))
                         * 1000000 + 0.5) AS BIGINT) AS gap_micro
        FROM j
    ),
    cum AS (
        SELECT *, sum(gap_micro) OVER (
                   PARTITION BY c_nationkey ORDER BY bal_bin
                   ROWS UNBOUNDED PRECEDING) AS cum_micro
        FROM snapped
    )
    SELECT c_nationkey,
           CAST(class_size AS BIGINT) AS class_size,
           CAST(sum(abs(cum_micro)) // m.denom AS BIGINT) AS emd_micro,
           CAST(sum(abs(gap_micro)) // 2 AS BIGINT) AS tvd_micro
    FROM cum, m
    GROUP BY c_nationkey, class_size, m.denom
    ORDER BY c_nationkey
    """


@query("quality_t_closeness", oracle=_t_closeness_oracle())
def quality_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (operators.quality.t_closeness, Li/Li/
    Venkatasubramanian 2007) — the skewness-attack gap l-diversity leaves
    open: a class can hold l distinct sensitive values yet still leak
    when its DISTRIBUTION diverges from the corpus global (90% of one
    value in-class vs 1% globally). Completes the privacy quartet: PII
    scrub → k-anonymity → l-diversity → t-closeness. Per nation, the
    ordered earth-mover's distance AND total-variation distance between
    the class's balance-bin distribution and the global one — per-value
    probability gaps snap to integer micros first (one exact-int division
    per side), the ordered prefix sum accumulates exact integers, and
    both normalizations are integer div, so every arithmetic step replays
    bit-for-bit. Audit mode (no threshold): one row per nation at every
    scale — no parameter saturation to tune (the l-diversity lesson).
    One (quasi, value) rollup + a broadcast dense value grid + a per-class
    m-row prefix window; no corpus-sized shuffle past the first rollup."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _T_BIN).cast("long").alias("bal_bin"),
    )
    out = Q.t_closeness(c, ["c_nationkey"], "bal_bin")
    return out.select(
        "c_nationkey",
        F.col("class_size").cast("long").alias("class_size"),
        "emd_micro",
        "tvd_micro",
    ).orderBy("c_nationkey")


# ---------------------------------------------------------------------------
# two-sample KS drift (round 9) — the ingestion-wave distribution monitor
# ---------------------------------------------------------------------------

_KS_BIN_CENTS = 500  # 5-currency-unit value bins


@query(
    "quality_ks_drift",
    oracle=f"""
    WITH base AS (
        SELECT event_type, CAST(epoch(ts) AS BIGINT) AS es,
               CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT)
                   // {_KS_BIN_CENTS} AS bin
        FROM events
    ),
    mid AS (SELECT (min(es) + max(es)) // 2 AS m FROM base),
    sided AS (SELECT event_type, bin, es <= m AS is_a FROM base, mid),
    counts AS (
        SELECT event_type, bin,
               sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS b
        FROM sided GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, sum(a) AS n_a, sum(b) AS n_b FROM counts GROUP BY 1),
    cum AS (
        SELECT event_type, bin,
               sum(a) OVER w AS cum_a, sum(b) OVER w AS cum_b
        FROM counts
        WINDOW w AS (PARTITION BY event_type ORDER BY bin
                     ROWS UNBOUNDED PRECEDING)
    ),
    gap AS (
        SELECT c.event_type, t.n_a, t.n_b,
               abs(c.cum_a * t.n_b - c.cum_b * t.n_a) AS g
        FROM cum c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n_a > 0 AND n_b > 0
                     THEN max(g) * 1000000 // (n_a * n_b)
                     ELSE -1 END AS BIGINT) AS ks_micro
    FROM gap
    GROUP BY event_type, n_a, n_b
    ORDER BY event_type
    """,
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift monitor (operators.quality.
    ks_drift) — the distribution-shift check a training pipeline runs
    between ingestion waves: per event type, the KS distance between the
    value distributions of the time-range halves (events at/before the
    (min+max)/2 epoch midpoint vs after). EXACT-INTEGER KS: cumulative
    bin counts stay int64 and max |cumA*nB - cumB*nA| * 1e6 div (nA*nB)
    is pure integer arithmetic — no float CDFs anywhere, so the oracle
    replays binning, the midpoint split, the prefix sums, and the max
    bit-for-bit. One (type, bin, side) rollup + one per-type prefix
    window over OBSERVED bins only (the CDF gap is constant between
    observed bins, so the max needs no dense grid)."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("es"),
        F.expr(
            f"CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT)"
            f" div {_KS_BIN_CENTS}"
        ).alias("bin"),
    )
    mid = base.agg(
        F.expr("CAST((min(es) + max(es)) div 2 AS BIGINT)").alias("m")
    )
    sided = base.crossJoin(F.broadcast(mid)).select(
        "event_type", "bin", (F.col("es") <= F.col("m")).alias("is_a")
    )
    out = Q.ks_drift(sided, ["event_type"], "is_a", "bin")
    return out.orderBy("event_type")


@query(
    "quality_psi_drift",
    oracle=f"""
    WITH base AS (
        SELECT event_type, CAST(epoch(ts) AS BIGINT) AS es,
               CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT)
                   // {_KS_BIN_CENTS} AS bin
        FROM events
    ),
    mid AS (SELECT (min(es) + max(es)) // 2 AS m FROM base),
    sided AS (SELECT event_type, bin, es <= m AS is_a FROM base, mid),
    counts AS (
        SELECT event_type, bin,
               sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS b
        FROM sided GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, sum(a) AS n_a, sum(b) AS n_b,
               count(*) AS n_bins
        FROM counts GROUP BY 1
    ),
    terms AS (
        SELECT c.event_type, t.n_a, t.n_b,
               CAST(floor(
                   (CAST(c.a + 1 AS DOUBLE) / CAST(t.n_a + t.n_bins AS DOUBLE)
                    - CAST(c.b + 1 AS DOUBLE) / CAST(t.n_b + t.n_bins AS DOUBLE))
                   * ln((CAST(c.a + 1 AS DOUBLE) * CAST(t.n_b + t.n_bins AS DOUBLE))
                        / (CAST(c.b + 1 AS DOUBLE) * CAST(t.n_a + t.n_bins AS DOUBLE)))
                   * 1000000 + 0.5) AS BIGINT) AS term
        FROM counts c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(CASE WHEN n_a > 0 AND n_b > 0 THEN sum(term)
                     ELSE -1 END AS BIGINT) AS psi_micro
    FROM terms
    GROUP BY event_type, n_a, n_b
    ORDER BY event_type
    """,
)
def quality_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor (operators.quality.
    psi_drift, round 10) — the industry-standard companion to the KS gate:
    per event type, PSI = sum (pA - pB) ln(pA / pB) over the observed
    value bins of the time-range halves, with add-one smoothing over the
    key's observed bin set (pX = (x+1)/(nX+B)) so one-sided bins
    contribute finite terms. Where KS reports the single worst CDF gap,
    PSI integrates shift across every bin. Per-bin terms are non-negative
    and snap to integer micros BEFORE the per-key sum (order-proof); the
    oracle replays binning, the midpoint split, smoothing, the ln ratio
    of exact double products, and the snapped sum. Same single-scan shape
    as quality_ks_drift: one (type, bin, side) rollup, totals + bin
    counts from one full-frame window, one grouped sum."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT)").alias("es"),
        F.expr(
            f"CAST(floor(abs(coalesce(value, 0)) * 100 + 0.5) AS BIGINT)"
            f" div {_KS_BIN_CENTS}"
        ).alias("bin"),
    )
    mid = base.agg(
        F.expr("CAST((min(es) + max(es)) div 2 AS BIGINT)").alias("m")
    )
    sided = base.crossJoin(F.broadcast(mid)).select(
        "event_type", "bin", (F.col("es") <= F.col("m")).alias("is_a")
    )
    return Q.psi_drift(sided, ["event_type"], "is_a", "bin").orderBy("event_type")
