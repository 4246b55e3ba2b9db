"""Count-min sketch: mergeable frequency estimation for key spaces too
large to exact-count — the streaming/distributed heavy-hitters building
block (token frequencies over a 100 TB corpus, hot-key detection before a
join, approximate vocabularies).

Design is the textbook CMS (Cormode & Muthukrishnan): depth d independent
hash rows × width w buckets; count(key) is over-estimated by
min_d(bucket_d(key)) with error ≤ εN at probability 1-δ (w = ⌈e/ε⌉,
d = ⌈ln 1/δ⌉). Everything is md5-derived (salted per row) like the dedup
family, so a DuckDB oracle replays the sketch BIT-FOR-BIT — estimates and
all.

Scale shape:

- `cms_build` is one explode (d rows per item) + one (row, bucket) grouped
  count with map-side combine: the sketch is ≤ d·w rows TOTAL regardless of
  input size — broadcast-sized by construction, and two corpora's sketches
  merge by bucket-wise addition (`cms_merge`), the property that makes CMS
  the distributed/streaming choice over exact dictionaries.
- `cms_estimate` explodes the probe keys (d rows each) and equality-joins
  the sketch — the sketch side broadcasts, no shuffle of the probe set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CMS_DEPTH",
    "CMS_WIDTH",
    "cms_build",
    "cms_merge",
    "cms_estimate",
    "HLL_P",
    "HLL_M",
    "HLL_WBITS",
    "hll_alpha_m2",
    "hll_registers",
    "hll_estimate_corrected",
    "hll_merge",
    "hll_estimate",
    "HDR_MBITS",
    "hdr_bucket_key",
    "hdr_lower_bound",
    "hdr_histogram",
    "hdr_merge",
    "hdr_quantiles",
]

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _row_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row``: 28-bit md5 of the salted key,
    mod width. Identical in DuckDB: CAST(('0x'||substr(md5('cms<row>:'||k),
    1,7)) AS BIGINT) % width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), key)), 1, 7), 16, 10
    ).cast("long")
    return h % width


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt) sketch of the (multiset) key column — one row per
    OCCURRENCE counts, like the exact frequency table it replaces."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"), _row_bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bucket-wise sum of two sketches built with the same (depth, width) —
    the linearity that lets per-partition / per-day sketches roll up."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key_col, cms_count) for each distinct probe key: min over the key's
    depth buckets — never an underestimate; over by ≤ εN w.h.p. A probe key
    hashing to an untouched bucket estimates 0 (the join is left + null→0,
    so unseen keys behave)."""
    key = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("row"), _row_bucket(key, d, width).alias("bucket")
            )
            for d in range(depth)
        ]
    )
    probe_cells = (
        probes.select(key_col).distinct()
        .select(key_col, F.explode(cells).alias("c"))
        .select(key_col, "c.row", "c.bucket")
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog: mergeable DISTINCT-count estimation (Flajolet et al. 2007).
#
# Same md5-determinism contract as the CMS above, so a SQL oracle replays the
# REGISTERS and the estimate bit-for-bit: the 28-bit salted hash splits into
# an 8-bit bucket and a 20-bit suffix w; the register update is
# max(rho) with rho = (#leading zero bits of w) + 1 = 21 - bit_length(w)
# (21 for w = 0), computed integer-only via length(bin(w)) in both engines.
#
# The estimate keeps the arithmetic exactly replayable by staying in
# integers until ONE final IEEE division: the harmonic sum
# sum_j 2^(-rho_j) is scaled by 2^20 so every term 2^(20 - rho_j) is an
# exact integer (empty buckets contribute 2^20), and
# est = alpha_m * m^2 * 2^20 / S_int — alpha_m * m^2 * 2^20 is one Python
# double literal shared with the SQL twin, so both engines perform the same
# single division. The small/large-range corrections (linear counting,
# log-based) are deliberately omitted: they need ln(), which is not
# bit-portable; this is the RAW HLL estimator, ±~6.5% at m=256, and the
# gate reports the exact distinct alongside it.
#
# Scale shape: registers are ≤ m rows per group regardless of input
# (one grouped max with map-side combine); two corpora's registers merge by
# bucket-wise MAX (`hll_merge`) — the distributed/streaming distinct-count
# analog of `cms_merge`.
# ---------------------------------------------------------------------------

HLL_P = 8  # bucket bits
HLL_M = 1 << HLL_P  # 256 buckets
HLL_WBITS = 20  # suffix bits (28-bit md5 hash minus bucket bits)


def hll_alpha_m2(m: int = HLL_M) -> float:
    """alpha_m * m^2 (the standard bias constant for m >= 128), scaled by
    2^HLL_WBITS — the single double literal both engines multiply into the
    final division."""
    return 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << HLL_WBITS)


def _hll_bucket_rho(key: Column) -> tuple[Column, Column]:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), key)), 1, 7), 16, 10
    ).cast("long")
    bucket = h % HLL_M
    w = F.shiftrightunsigned(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return bucket, rho.cast("int")


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, rho): the per-group HLL register array as rows —
    at most HLL_M rows per group, whatever the input size."""
    group_cols = group_cols or []
    bucket, rho = _hll_bucket_rho(F.col(key_col).cast("string"))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Bucket-wise MAX of two register sets — lossless: merging per-day /
    per-partition registers equals the single-pass registers exactly."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., hll_est): raw HLL estimate per group from the registers.
    Integer harmonic sum (empty buckets contribute 2^HLL_WBITS), one final
    double division, micro-snapped — bit-replayable in SQL."""
    group_cols = group_cols or []
    scale = 1 << HLL_WBITS
    s_present = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_WBITS} + 1 - rho)")
    )
    # NB: 2^(WBITS - rho) is fractional for rho = WBITS+1, so terms are
    # scaled by 2^(WBITS+1); the numerator literal picks up the same factor.
    s_int = (
        s_present + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(2 * scale)
    ).alias("s_int")
    est = F.lit(2.0 * hll_alpha_m2()) / s_int.cast("double")
    return (
        registers.groupBy(*group_cols)
        .agg(
            (F.floor(est * 1000000 + F.lit(0.5)) / 1000000.0).alias("hll_est"),
            F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        )
    )


def hll_estimate_corrected(
    registers: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """hll_estimate + the standard small-range correction (Flajolet et al.
    2007 §4): when the raw estimate falls below 2.5·m AND empty registers
    exist, switch to LinearCounting — est = m·ln(m/V), V = empty registers.

    Why it exists (measured, tools/sketch_quality.py): the raw harmonic
    estimator is ±1.04/√m only in its design range; at true cardinality 31
    with m = 256 it reported 199.6 (+540%), while LinearCounting lands
    within a few percent. The DRIVER gates keep replaying the raw
    estimator (its one division is the only float op and is bit-replayable;
    ln() across engines is not guaranteed identical to the last bit), so
    this variant is the production read path, pinned by pytest floors
    rather than a SQL oracle.

    Output adds `estimator` ('raw' | 'linear_counting') so consumers can
    see which regime answered."""
    group_cols = group_cols or []
    raw = hll_estimate(registers, group_cols)
    m = float(HLL_M)
    v = (F.lit(HLL_M) - F.col("n_buckets_used")).cast("double")
    lc = F.lit(m) * F.log(F.lit(m) / v)
    use_lc = (F.col("hll_est") <= F.lit(2.5 * m)) & (v > 0)
    return raw.select(
        *group_cols,
        F.when(use_lc, lc).otherwise(F.col("hll_est")).alias("hll_est"),
        F.when(use_lc, F.lit("linear_counting"))
        .otherwise(F.lit("raw"))
        .alias("estimator"),
        "n_buckets_used",
    )


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch: mergeable percentile estimation with a
# BOUNDED relative error and a BOUNDED footprint (the HdrHistogram design,
# Gil Tene — log-scale exponent buckets refined by HDR_MBITS mantissa bits,
# so every bucket spans at most a 2^-HDR_MBITS relative range).
#
# Everything is INTEGER arithmetic — bucket keys, counts, cumulative ranks,
# and the reported quantile lower bounds — so a DuckDB oracle replays the
# sketch AND the quantile answers bit-for-bit (no IEEE division anywhere,
# unlike the HLL above which needs exactly one).
#
# Scale shape (100 TB): the histogram is ONE grouped count with map-side
# combine, at most (64 - m) * 2^m + 2^m rows per group whatever the input
# size (m=5 → ≤ 1,920 rows); two days'/partitions' histograms merge by
# bucket-wise addition (`hdr_merge`) exactly like `cms_merge`. Quantile
# extraction folds the (tiny, bounded-by-construction) per-group bucket
# array with `aggregate()` — no global window, no driver collect.
#
# This is the monitoring/quality-gate primitive the exact
# `percentile_cont` path (plans/kpi.py A5) cannot provide at stream/corpus
# scale: exact percentiles need a full sort per group; the sketch needs one
# map-side-combined count and answers any quantile after the fact.
# ---------------------------------------------------------------------------

HDR_MBITS = 5  # mantissa bits: relative bucket width <= 2^-5 ~ 3.1%


def hdr_bucket_key(v: Column, m: int = HDR_MBITS) -> Column:
    """Integer bucket key of non-negative bigint ``v``, monotone in value.

    Values below 2^m are EXACT (key = v); above, the key packs
    (exponent e = bit_length(v) - 1, top m+1 mantissa bits) as
    (e << m) + ((v >> (e - m)) - 2^m). Exact keys live in [0, 2^m);
    packed keys start at (m << m) >= 2^m — the regions never collide.
    Identical in DuckDB with length(bin(v)), >>, +."""
    lo = 1 << m
    e = (F.length(F.bin(v)) - F.lit(1)).cast("int")
    # v >> (e - m) with a COLUMN shift amount: the Python wrapper only takes
    # an int literal, so call the SQL function directly (DuckDB twin:
    # v >> (e - m)) — integer all the way, exact for any non-negative long.
    shifted = F.call_function("shiftrightunsigned", v, e - F.lit(m))
    packed = (e.cast("long") * F.lit(lo)) + (shifted - F.lit(lo))
    return F.when(v < lo, v).otherwise(packed).cast("long")


def hdr_lower_bound(key: Column, m: int = HDR_MBITS) -> Column:
    """Smallest value mapping to ``key`` — the quantile answer the sketch
    reports (a guaranteed LOWER bound on the true quantile, within
    2^-m relative). Integer-only; same CASE in SQL."""
    lo = 1 << m
    e = F.shiftright(key, m).cast("int")
    sub = (key % F.lit(lo)) + F.lit(lo)
    return (
        F.when(key < lo, key)
        .otherwise(F.call_function("shiftleft", sub, e - F.lit(m)))
        .cast("long")
    )


def hdr_histogram(
    df: DataFrame, value_col: str | Column, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., key, cnt): the per-group HDR histogram. ``value_col`` must
    be a non-negative bigint (cast/scale upstream — e.g. prices to cents)."""
    group_cols = group_cols or []
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    return (
        df.select(*group_cols, hdr_bucket_key(v).alias("key"))
        .groupBy(*group_cols, "key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hdr_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Bucket-wise sum — lossless: merged per-partition histograms equal the
    single-pass histogram exactly (same linearity as `cms_merge`)."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "key")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hdr_quantiles(
    hist: DataFrame,
    quantiles: list[tuple[str, int, int]] | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., n, <name>... ) — for each (name, num, den) quantile
    q = num/den, the lower bound of the bucket holding rank ceil(q·n),
    computed by folding the sorted (key, cnt) bucket array per group.

    The fold is over a BOUNDED array (≤ ~2k buckets by construction, not
    data-sized), so `collect_list` here is safe at any scale; rank targets
    use integer ceil ((n·num + den - 1) div den) — no floats anywhere."""
    group_cols = group_cols or []
    quantiles = quantiles or [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    one = hist.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("key", "cnt"))).alias("arr"),
        F.sum("cnt").cast("long").alias("n"),
    )
    cols = [*group_cols, F.col("n")]
    for name, num, den in quantiles:
        target = F.expr(f"CAST((n * {num} + {den} - 1) DIV {den} AS BIGINT)")
        found = F.aggregate(
            F.col("arr"),
            F.struct(
                F.lit(0).cast("long").alias("cum"), F.lit(-1).cast("long").alias("k")
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["cnt"]).alias("cum"),
                F.when(acc["k"] >= 0, acc["k"])
                .otherwise(
                    F.when(acc["cum"] + x["cnt"] >= target, x["key"]).otherwise(
                        F.lit(-1).cast("long")
                    )
                )
                .alias("k"),
            ),
            lambda acc: acc["k"],
        )
        cols.append(hdr_lower_bound(found).alias(name))
    return one.select(*cols)
