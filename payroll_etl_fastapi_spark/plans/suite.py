"""Driver-facing query suite: every operator from SURVEY.md §2, re-expressed
over the driver's TPC-H-ish testdata, each paired with an ANSI-SQL oracle that
DuckDB runs on the same parquet tables.

Mapping from the reference's payroll star to the testdata star:
fact_payroll → lineitem/orders (measures; month = ship/order-date ranges),
dim_employee → customer, dim_dept → nation. The operator semantics are the
reference's (SURVEY.md §2 IDs cited per query); the tables differ because the
driver's correctness gate runs on its own synthetic data (TESTDATA.md).

Cross-engine determinism rules (learned the hard way; see tools/check_oracle.py):
- every aggregate/computed column is aliased identically in Spark and SQL;
- money aggregates are summed in integer cents: each addend is rounded with
  floor(x*100 + 0.5) (identical IEEE ops in both engines — Spark's round() and
  DuckDB's round() disagree on doubles within float-error of a .xx5 tie), cast
  to bigint, summed exactly (order-independent), divided by 100.0 at the end;
- per-row doubles that are bit-identical in both engines (raw columns, exact
  percentiles, ratios of identical values) use the same floor formula directly;
- every ORDER BY ... LIMIT carries a unique tiebreak column;
- timestamp outputs are emitted as formatted strings (no type/zone ambiguity).

Scale notes: each query is written the way it should run on 100 TB — range
predicates that push down to parquet (verified PushedFilters), broadcast hints
on dimension joins, partial aggregation before shuffles, top-K via
orderBy().limit() (TakeOrderedAndProject, never a global sort).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Per-process memo for EXPENSIVE TEST SCAFFOLDING shared across bench passes
# (VERDICT r6 #7): gate INPUTS that are not themselves the operator under
# test — the warclite shard corpus the scan/stream gates read, the trained
# BPE merge table the apply gate re-applies. The gate's declared computation
# must stay inside the timed region; only input materialization may be
# memoized, so per-gate exec is unchanged and the suite total loses the
# duplicated setup. Keyed by (sf_dir, label); values may be plain Python
# artifacts (merge lists) or filesystem paths (cleaned at interpreter exit).
_FIXTURE_CACHE: dict[tuple[str, str], object] = {}


def fixture(sf_dir: str, label: str, build: Callable[[], object]) -> object:
    k = (sf_dir, label)
    if k not in _FIXTURE_CACHE:
        _FIXTURE_CACHE[k] = build()
    return _FIXTURE_CACHE[k]


# -- cross-engine deterministic numerics (see module docstring) --------------

def _r2(c) -> F.Column:
    """floor(x*100 + 0.5)/100 — bit-equal in Spark and DuckDB."""
    return F.floor(c * 100 + F.lit(0.5)) / 100.0


def _r6(c) -> F.Column:
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000.0


def _cents(c) -> F.Column:
    """Integer cents of a money expression (exact, order-independent to sum)."""
    return F.floor(c * 100 + F.lit(0.5)).cast("long")


def _msum(c) -> F.Column:
    """Money sum: exact integer-cents sum, reported in currency units."""
    return F.sum(_cents(c)) / 100.0


# SQL twins of the helpers (inlined into oracle strings)
def _sql_cents(expr: str) -> str:
    return f"CAST(floor(({expr}) * 100 + 0.5) AS BIGINT)"


def _sql_msum(expr: str) -> str:
    return f"sum({_sql_cents(expr)}) / 100.0"


def _sql_r2(expr: str) -> str:
    return f"floor(({expr}) * 100 + 0.5) / 100"


def _sql_r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"


# ---------------------------------------------------------------------------
# KPI analogs (reference parity operators over testdata)
# ---------------------------------------------------------------------------

@query(
    "kpi_summary_month",
    oracle=f"""
    SELECT {_sql_msum('l_extendedprice * (1 - l_discount)')}   AS revenue,
           {_sql_r2('sum(l_quantity)')}                        AS sum_qty,
           {_sql_msum('l_extendedprice')}                      AS sum_base,
           {_sql_msum('l_tax * l_extendedprice')}              AS sum_tax,
           count(DISTINCT l_orderkey)                          AS order_count,
           count(*)                                            AS line_count,
           {_sql_r6(f"sum({_sql_cents('l_tax * l_extendedprice')}) * 1.0 / nullif(sum({_sql_cents('l_extendedprice')}), 0)")}
                                                               AS tax_share
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def kpi_summary_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 ungrouped multi-SUM + A2 exact COUNT(DISTINCT) + P2 month filter +
    P12 in-engine ratio (reference /root/reference/src/api.py:21-44).

    The month filter is a closed-open timestamp range: it reaches the parquet
    scan as PushedFilters (min/max row-group skipping) — the scan analog of the
    reference's fact_payroll(month) index."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    base = F.col("l_extendedprice")
    rev = base * (1 - F.col("l_discount"))
    taxamt = F.col("l_tax") * base
    return li.agg(
        _msum(rev).alias("revenue"),
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _msum(base).alias("sum_base"),
        _msum(taxamt).alias("sum_tax"),
        F.countDistinct("l_orderkey").alias("order_count"),
        F.count(F.lit(1)).alias("line_count"),
        _r6(
            F.sum(_cents(taxamt)) * 1.0 / F.nullif(F.sum(_cents(base)), F.lit(0))
        ).alias("tax_share"),
    )


@query(
    "kpi_rollup_by_nation",
    oracle=f"""
    SELECT n.n_name                                            AS nation,
           {_sql_msum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           {_sql_r2('sum(l.l_quantity)')}                      AS sum_qty,
           count(DISTINCT o.o_custkey)                         AS customers,
           count(*)                                            AS line_count
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def kpi_rollup_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 grouped rollup + J2/J3 dim joins + O1 name ordering (reference
    by-dept, /root/reference/src/api.py:46-73). customer/nation are broadcast —
    the fact never shuffles until the final partial-agg + exchange on n_name."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            _msum(rev).alias("revenue"),
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            F.countDistinct("o_custkey").alias("customers"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("nation")
    )


@query(
    "kpi_delta_months",
    oracle=f"""
    WITH a AS (
        SELECT n.n_name AS nation,
               sum({_sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS cents
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01' AND l.l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY n.n_name
    ), b AS (
        SELECT n.n_name AS nation,
               sum({_sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS cents
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-04-01' AND l.l_shipdate < TIMESTAMP '1996-05-01'
        GROUP BY n.n_name
    )
    SELECT coalesce(a.nation, b.nation)                          AS nation,
           (coalesce(b.cents, 0) - coalesce(a.cents, 0)) / 100.0 AS revenue_delta
    FROM a FULL OUTER JOIN b ON a.nation = b.nation
    ORDER BY nation
    """,
)
def kpi_delta_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 full-outer month-over-month delta + P5 coalesce-both-sides (reference
    delta per-dept, /root/reference/src/api.py:92-106): a nation present in only
    one month still appears (SURVEY.md §2.8.6). Deltas are exact cents math."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def month_cents(lo: str, hi: str, alias: str) -> DataFrame:
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            li.filter(
                (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            )
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias(f"{alias}_nation"))
            .agg(F.sum(_cents(rev)).alias(f"{alias}_cents"))
        )

    a = month_cents("1996-03-01", "1996-04-01", "a")
    b = month_cents("1996-04-01", "1996-05-01", "b")
    zero = F.lit(0).cast("long")
    return (
        a.join(b, a.a_nation == b.b_nation, "full_outer")
        .select(
            F.coalesce("a_nation", "b_nation").alias("nation"),
            ((F.coalesce("b_cents", zero) - F.coalesce("a_cents", zero)) / 100.0).alias(
                "revenue_delta"
            ),
        )
        .orderBy("nation")
    )


@query(
    "kpi_anomalies_mad",
    oracle=f"""
    WITH data AS (
        SELECT o.o_orderkey, n.n_name AS nation, o.o_totalprice AS price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
    ), med AS (
        SELECT nation, percentile_cont(0.5) WITHIN GROUP (ORDER BY price) AS median_price
        FROM data GROUP BY nation
    ), mad AS (
        SELECT d.nation,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(d.price - med.median_price)) AS mad
        FROM data d JOIN med ON d.nation = med.nation
        GROUP BY d.nation
    ), scored AS (
        SELECT d.o_orderkey, d.nation, d.price, med.median_price, mad.mad,
               0.6745 * (d.price - med.median_price) / nullif(mad.mad, 0) AS z
        FROM data d
        JOIN med ON d.nation = med.nation
        JOIN mad ON d.nation = mad.nation
    ), topk AS (
        SELECT * FROM scored
        ORDER BY abs(coalesce(z, 0)) DESC, o_orderkey
        LIMIT 20
    )
    SELECT o_orderkey, nation,
           {_sql_r2('price')}        AS price,
           {_sql_r2('median_price')} AS median_price,
           {_sql_r2('mad')}          AS mad,
           {_sql_r6('z')}            AS z
    FROM topk
    WHERE z IS NULL OR abs(z) >= 1.5
    ORDER BY o_orderkey
    """,
)
def kpi_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hardest surface (/root/reference/src/api.py:201-275):
    A5 exact median, A6 MAD via join-back, P6-P9 robust z, O2 top-K BEFORE the
    O3 threshold filter, NULL-z rows kept (SURVEY.md §2.8.2-3).

    Scale: med/mad are per-group scalars — tiny frames — so the join-backs are
    broadcasts; top-K is TakeOrderedAndProject (no global sort)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    data = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "o_orderkey", F.col("n_name").alias("nation"), F.col("o_totalprice").alias("price")
        )
    )
    med = data.groupBy("nation").agg(F.expr("percentile(price, 0.5)").alias("median_price"))
    mad = (
        data.join(F.broadcast(med), "nation")
        .withColumn("abs_dev", F.abs(F.col("price") - F.col("median_price")))
        .groupBy("nation")
        .agg(F.expr("percentile(abs_dev, 0.5)").alias("mad"))
    )
    scored = (
        data.join(F.broadcast(med), "nation")
        .join(F.broadcast(mad), "nation")
        .withColumn(
            "z",
            F.lit(0.6745)
            * (F.col("price") - F.col("median_price"))
            / F.nullif(F.col("mad"), F.lit(0.0)),
        )
    )
    topk = scored.orderBy(
        F.abs(F.coalesce(F.col("z"), F.lit(0.0))).desc(), F.col("o_orderkey")
    ).limit(20)
    return (
        topk.filter(F.col("z").isNull() | (F.abs(F.col("z")) >= 1.5))
        .select(
            "o_orderkey",
            "nation",
            _r2(F.col("price")).alias("price"),
            _r2(F.col("median_price")).alias("median_price"),
            _r2(F.col("mad")).alias("mad"),
            _r6(F.col("z")).alias("z"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "pivot_conditional_agg",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
                    THEN {_sql_cents('o_totalprice')} ELSE 0 END) / 100.0 AS m1_total,
           sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-02-01' AND o_orderdate < TIMESTAMP '1996-03-01'
                    THEN {_sql_cents('o_totalprice')} ELSE 0 END) / 100.0 AS m2_total,
           sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-03-01' AND o_orderdate < TIMESTAMP '1996-04-01'
                    THEN {_sql_cents('o_totalprice')} ELSE 0 END) / 100.0 AS m3_total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def pivot_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 conditional-aggregation manual pivot (reference delta company totals,
    /root/reference/src/api.py:113-120) — one scan, no join, no real pivot op."""
    orders = _t(spark, sf_dir, "orders")

    def bucket(lo: str, hi: str) -> F.Column:
        return F.sum(
            F.when(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp")),
                _cents(F.col("o_totalprice")),
            ).otherwise(F.lit(0).cast("long"))
        ) / 100.0

    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            bucket("1996-01-01", "1996-02-01").alias("m1_total"),
            bucket("1996-02-01", "1996-03-01").alias("m2_total"),
            bucket("1996-03-01", "1996-04-01").alias("m3_total"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Ingest-transform operators (S-series)
# ---------------------------------------------------------------------------

@query(
    "distinct_sorted_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment AS segment FROM customer ORDER BY segment
    """,
)
def distinct_sorted_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 sorted-distinct projection (reference dept list, /root/reference/src/etl.py:19)."""
    return (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
        .orderBy("segment")
    )


@query(
    "dedupe_keep_first",
    oracle=f"""
    WITH ranked AS (
        SELECT l_orderkey, l_quantity, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice, l_quantity
               ) AS rn
        FROM lineitem
    )
    SELECT count(*)                           AS n_rows,
           {_sql_r2('sum(l_quantity)')}       AS sum_qty,
           {_sql_msum('l_extendedprice')}     AS sum_price
    FROM ranked WHERE rn = 1
    """,
)
def dedupe_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 keyed keep-first dedupe (reference drop_duplicates('emp_id'),
    /root/reference/src/etl.py:33) made deterministic via row_number —
    aggregated so the oracle compare is order-free and compact.

    (l_orderkey, l_linenumber) is not unique in the synthetic data, hence the
    full tiebreak chain."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _msum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


@query(
    "upsert_composite_key",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ), unioned AS (
        SELECT o_orderkey, o_custkey, o_totalprice, 1 AS pri FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, o_totalprice, 0 AS pri FROM updates
    ), merged AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY pri) AS rn
        FROM unioned
    )
    SELECT count(*)                        AS n_rows,
           {_sql_msum('o_totalprice')}     AS total,
           count(DISTINCT o_orderkey)      AS n_keys
    FROM merged WHERE rn = 1
    """,
)
def upsert_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 keyed upsert semantics (reference ON CONFLICT DO UPDATE,
    /root/reference/src/etl.py:65-77) exercised through operators.upsert:
    updates win on key collision; result aggregated for compact compare."""
    from payroll_etl_fastapi_spark.operators.upsert import upsert

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    updates = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    merged = upsert(orders, updates, ["o_orderkey"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        _msum(F.col("o_totalprice")).alias("total"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


@query(
    "insert_if_absent",
    oracle=f"""
    WITH incoming AS (
        SELECT c_custkey + 100000 AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 1
    ), merged AS (
        SELECT * FROM customer
        UNION ALL
        SELECT i.* FROM incoming i
        LEFT JOIN customer c ON i.c_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL
    )
    SELECT count(*) AS n_rows, count(DISTINCT c_custkey) AS n_keys,
           {_sql_msum('c_acctbal')} AS total_bal
    FROM merged
    """,
)
def insert_if_absent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 insert-if-absent (reference ON CONFLICT DO NOTHING,
    /root/reference/src/etl.py:21-29): existing keys win, new keys appended."""
    from payroll_etl_fastapi_spark.operators.upsert import insert_if_absent

    cust = _t(spark, sf_dir, "customer")
    incoming = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .withColumn("c_custkey", F.col("c_custkey") + 100000)
        .unionByName(cust.filter(F.col("c_custkey") % 3 == 1))
    )
    merged = insert_if_absent(cust, incoming, ["c_custkey"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("c_custkey").alias("n_keys"),
        _msum(F.col("c_acctbal")).alias("total_bal"),
    )


# ---------------------------------------------------------------------------
# Sorts / top-K / exact percentiles
# ---------------------------------------------------------------------------

@query(
    "topk_orders",
    oracle=f"""
    SELECT o_orderkey, {_sql_r2('o_totalprice')} AS totalprice, o_orderpriority AS priority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 top-K by computed key (reference ORDER BY |z| DESC LIMIT,
    /root/reference/src/api.py:240-246): plans as TakeOrderedAndProject —
    per-partition heaps + single merge, never a global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey",
            _r2(F.col("o_totalprice")).alias("totalprice"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


@query(
    "median_by_group",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           {_sql_r2('percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)')} AS median_price,
           {_sql_r2('percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice)')} AS p25,
           {_sql_r2('percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice)')} AS p75,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 exact ordered-set percentile (reference percentile_cont,
    /root/reference/src/api.py:163-164): Spark's exact `percentile` uses the
    same linear interpolation; percentile_approx is deliberately NOT used."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            _r2(F.expr("percentile(o_totalprice, 0.5)")).alias("median_price"),
            _r2(F.expr("percentile(o_totalprice, 0.25)")).alias("p25"),
            _r2(F.expr("percentile(o_totalprice, 0.75)")).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Events: scalar extraction + time bucketing (batch analogs of streaming ops)
# ---------------------------------------------------------------------------

@query(
    "events_hourly_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           count(*)                   AS n_events,
           {_sql_msum('value')}       AS total_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation in batch form — the exact frame the
    streaming path (streaming/events.py) maintains incrementally; hour emitted
    as a formatted string so both engines agree on type and zone."""
    ev = _t(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    )
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _msum(F.col("value")).alias("total_value"),
        )
        .orderBy("hour", "event_type")
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_total
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string/JSON extraction (S-series scalar inventory, SURVEY.md
    §2.6) — regexp_extract stays JVM-side; no Python UDF."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("bigint")
            ).alias("k_total"),
        )
        .orderBy("event_type")
    )
