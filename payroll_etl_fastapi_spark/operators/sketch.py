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
    "hll_merge",
    "hll_estimate",
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
