"""CDC / SCD2 / incremental-refresh queries for the driver gate.

The reference maintains its warehouse with full-replace loads
(/root/reference/scripts/load_once.py:24-34) and type-1 ON CONFLICT upserts
(/root/reference/src/etl.py:24-38). These gates exercise the three
maintenance operators (operators/cdc.py) that extend that surface: ordered
change-feed application with deletes, Type-2 version history, and
partial-state merge — each against a DuckDB oracle that replays the exact
same derivation in ANSI SQL.

The change feeds are DERIVED deterministically from the testdata tables
(modulo predicates on the business key), so Spark and the oracle construct
bit-identical inputs at any scale factor with no side files.

Determinism notes: no NULL integers in any output (pandas silently floats
them — int64 2 vs float64 2.0 breaks the driver hash); open-ended SCD2
versions emit valid_to_seq = -1; booleans emit as 0/1 ints; money via
integer cents (suite._cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.cdc import (
    cdc_apply,
    merge_agg_states,
    scd2_apply,
)
from payroll_etl_fastapi_spark.plans.suite import (
    _cents,
    _r6,
    _sql_cents,
    _sql_r6,
    _t,
    query,
)

# Shared derivation of the orders change feed (see module docstring):
#   seq 1: every key with o_orderkey%10 in (0,1,2) — %10==0 is a delete,
#          the rest are updates that add 100 to the price;
#   seq 2: %20==0  → upsert (+200)  — tests delete-then-resurrect,
#          %20==11 → delete         — tests update-then-delete.
_SQL_FEED = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice
                ELSE o_totalprice + 100 END AS o_totalprice,
           o_orderdate, o_orderpriority,
           CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
           1 AS seq
    FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + 200,
           o_orderdate, o_orderpriority,
           CASE WHEN o_orderkey % 20 = 0 THEN 'U' ELSE 'D' END AS op,
           2 AS seq
    FROM orders WHERE o_orderkey % 20 IN (0, 11)
"""


def _orders_feed(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    b1 = (
        orders.filter((k % 10).isin(0, 1, 2))
        .withColumn(
            "o_totalprice",
            F.when(k % 10 == 0, F.col("o_totalprice")).otherwise(
                F.col("o_totalprice") + 100
            ),
        )
        .withColumn("op", F.when(k % 10 == 0, F.lit("D")).otherwise(F.lit("U")))
        .withColumn("seq", F.lit(1))
    )
    b2 = (
        orders.filter((k % 20).isin(0, 11))
        .withColumn("o_totalprice", F.col("o_totalprice") + 200)
        .withColumn("op", F.when(k % 20 == 0, F.lit("U")).otherwise(F.lit("D")))
        .withColumn("seq", F.lit(2))
    )
    return b1.unionByName(b2)


@query(
    "cdc_apply_orders",
    oracle=f"""
    WITH feed AS ({_SQL_FEED}),
    winners AS (
        SELECT * FROM (
            SELECT f.*,
                   row_number() OVER (
                       PARTITION BY o_orderkey
                       ORDER BY seq DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END
                   ) AS rn
            FROM feed f
        ) WHERE rn = 1
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM winners)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM winners WHERE op = 'U'
    )
    SELECT o_orderkey                      AS orderkey,
           o_orderstatus                   AS status,
           {_sql_cents('o_totalprice')}    AS price_cents,
           o_orderpriority                 AS priority
    FROM merged
    WHERE o_orderkey % 100 < 30
    ORDER BY orderkey
    """,
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered CDC feed applied to the orders snapshot, last writer wins.

    The probe window (o_orderkey%100 < 30) covers every feed case: deleted
    keys absent, resurrected keys carry +200, updated keys +100, untouched
    keys pass through unchanged.

    Scale shape: the window ranks only the feed (~3 rows per 10 keys here;
    log-sized in production); the snapshot is touched by exactly one
    key-partitioned anti-join exchange, never sorted or windowed.
    """
    orders = _t(spark, sf_dir, "orders")
    merged = cdc_apply(orders, _orders_feed(orders), keys=["o_orderkey"])
    return (
        merged.filter(F.col("o_orderkey") % 100 < 30)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderstatus").alias("status"),
            _cents(F.col("o_totalprice")).alias("price_cents"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy("orderkey")
    )


@query(
    "scd2_customer_segments",
    oracle="""
    WITH versions AS (
        SELECT c_custkey, c_mktsegment AS segment, 0 AS seq FROM customer
        UNION ALL
        SELECT c_custkey, 'SEG-' || CAST(c_custkey % 3 AS VARCHAR), 1
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'SEG-X', 2
        FROM customer WHERE c_custkey % 14 = 0
    )
    SELECT c_custkey                                   AS custkey,
           segment,
           seq                                         AS valid_from_seq,
           COALESCE(lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq), -1)
                                                       AS valid_to_seq,
           CASE WHEN lead(seq) OVER (PARTITION BY c_custkey ORDER BY seq)
                     IS NULL THEN 1 ELSE 0 END         AS is_current
    FROM versions
    WHERE c_custkey % 7 = 0
    ORDER BY custkey, valid_from_seq
    """,
)
def scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history of customer market segments: base dim at seq 0,
    a segment reassignment wave at seq 1 (every 7th key), a second wave at
    seq 2 (every 14th) — so half the changed keys get a three-version chain
    with a closed middle version.

    Scale shape: one exchange of (dim ∪ changes) on the key and one lead()
    window — no anti-join to separate changed from unchanged keys; the
    unchanged majority flows through the same window as single-row groups.
    Output restricted to the changed keys to keep the gate frame small;
    open-ended versions emit valid_to_seq = -1 (no NULL ints — see module
    docstring).
    """
    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    base = cust.select(
        "c_custkey", F.col("c_mktsegment").alias("segment"), F.lit(0).alias("seq")
    )
    wave1 = cust.filter(k % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("SEG-"), (k % 3).cast("string")).alias("segment"),
        F.lit(1).alias("seq"),
    )
    wave2 = cust.filter(k % 14 == 0).select(
        "c_custkey", F.lit("SEG-X").alias("segment"), F.lit(2).alias("seq")
    )
    hist = scd2_apply(base, wave1.unionByName(wave2), keys=["c_custkey"])
    return (
        hist.filter(k % 7 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            "segment",
            "valid_from_seq",
            F.coalesce("valid_to_seq", F.lit(-1)).alias("valid_to_seq"),
            F.col("is_current").cast("int").alias("is_current"),
        )
        .orderBy("custkey", "valid_from_seq")
    )


@query(
    "rollup_incremental_merge",
    oracle=f"""
    SELECT l_returnflag                                        AS returnflag,
           l_linestatus                                        AS linestatus,
           count(*)                                            AS n,
           CAST(sum({_sql_cents('l_quantity')}) AS BIGINT)     AS qty_cents,
           CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) AS price_cents,
           strftime(min(l_shipdate), '%Y-%m-%d')               AS first_ship,
           strftime(max(l_shipdate), '%Y-%m-%d')               AS last_ship,
           {_sql_r6('sum(' + _sql_cents('l_quantity') + ') / 100.0 / count(*)')}
                                                               AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY returnflag, linestatus
    """,
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup refresh: the lineitem pricing summary computed as
    TWO independent partial states (shipdate before/after 1997-01-01) merged
    with merge_agg_states — the oracle aggregates the whole table in one
    pass, so the gate proves state-merge ≡ full recompute.

    Scale shape: this is the operator that turns a daily 100 TB rescan into
    a scan of the new day only. Counts merge as sums, min/max as min/max of
    formatted date strings (lexicographic ≡ chronological for yyyy-MM-dd);
    the non-decomposable mean is derived from sum+count AFTER the merge.
    """
    li = _t(spark, sf_dir, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")

    def _state(part: DataFrame) -> DataFrame:
        return part.groupBy("l_returnflag", "l_linestatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("l_quantity"))).alias("qty_cents"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("price_cents"),
            F.min(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("first_ship"),
            F.max(F.date_format("l_shipdate", "yyyy-MM-dd")).alias("last_ship"),
        )

    old_state = _state(li.filter(F.col("l_shipdate") < cut))
    new_state = _state(li.filter(F.col("l_shipdate") >= cut))
    merged = merge_agg_states(
        [old_state, new_state],
        keys=["l_returnflag", "l_linestatus"],
        merge_exprs={
            "n": "sum",
            "qty_cents": "sum",
            "price_cents": "sum",
            "first_ship": "min",
            "last_ship": "max",
        },
    )
    return (
        merged.select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "n",
            "qty_cents",
            "price_cents",
            "first_ship",
            "last_ship",
            _r6(F.col("qty_cents") / 100.0 / F.col("n")).alias("avg_qty"),
        )
        .orderBy("returnflag", "linestatus")
    )
