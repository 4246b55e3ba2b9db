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

__all__ = ["CMS_DEPTH", "CMS_WIDTH", "cms_build", "cms_merge", "cms_estimate"]

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
