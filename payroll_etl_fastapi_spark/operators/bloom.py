"""Bloom-filter semi-join reduction: prune a huge fact scan with a
kilobyte-sized bitset built from the dimension's join keys — the sideways
information passing that makes fact⋈dim joins affordable when the dim side
is too big to BROADCAST but its KEY SET still fits a Bloom filter.

At 100 TB the regime this targets is common: a 50 GB dimension cannot be
broadcast, so the join becomes a sort-merge/shuffled-hash join and every
fact row — including the ~96% that can never match — pays the shuffle. A
Bloom filter over the dim keys is a few KB-MB regardless of dim width,
broadcasts trivially (here: folded into the plan as a literal long-array),
and eliminates non-matching fact rows BEFORE the Exchange. False positives
only ever let extra rows through; the real join removes them, so the
result is exactly the plain join's (which is what the gate's oracle
replays).

Mechanics (all JVM-side, no UDF):

- `bloom_build` hashes each key to ``hashes`` md5-salted bit positions
  (same salted-md5 family as the CMS / MinHash operators), distinct-sets
  them, and ORs them into ``bits/64`` longs with one grouped `bit_or` —
  the driver collects only the word array (``bits/64`` rows; 16 KiB for
  the default 2^17 bits), the same sketch-sized transfer as the IVF
  centroid trainer.
- `bloom_might_contain` probes the collected words as a constant-folded
  literal array: per hash, ``element_at(words, pos >> 6)`` then
  ``getbit(word, pos & 63)`` — O(1) per probe inside WholeStageCodegen.
  A NULL key probes NULL and is filtered out, matching inner-join
  semantics.

Sizing: FP rate ≈ (1 - e^(-hashes·n/bits))^hashes; the defaults
(2^17 bits, 5 hashes) hold ~1e4 keys below 1%. The filter is advisory —
an undersized bloom degrades pruning, never correctness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BLOOM_BITS",
    "BLOOM_HASHES",
    "bloom_bit_positions",
    "bloom_build",
    "bloom_might_contain",
]

BLOOM_BITS = 1 << 17  # 16 KiB of filter
BLOOM_HASHES = 5


def bloom_bit_positions(
    key: Column, bits: int = BLOOM_BITS, hashes: int = BLOOM_HASHES
) -> list[Column]:
    """The key's ``hashes`` bit positions: 28-bit salted md5, mod ``bits``
    (identical construction to operators.sketch._row_bucket)."""
    s = key.cast("string")
    out = []
    for h in range(hashes):
        hv = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{h}:"), s)), 1, 7), 16, 10
        ).cast("long")
        out.append(hv % bits)
    return out


def bloom_build(
    keys: DataFrame,
    key_col: str,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> list[int]:
    """Distributed build: one explode + distinct + grouped bit_or; returns
    the ``bits/64`` filter words (zero-filled for untouched words). The
    only driver transfer is the word array itself."""
    if bits % 64:
        raise ValueError(f"bits must be a multiple of 64, got {bits}")
    pos_arr = F.array(*bloom_bit_positions(F.col(key_col), bits, hashes))
    rows = (
        keys.select(F.explode(pos_arr).alias("pos"))
        .distinct()
        .select(
            F.shiftrightunsigned(F.col("pos"), 6).cast("int").alias("word"),
            F.col("pos").bitwiseAND(F.lit(63)).cast("int").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("w")
        )
        .collect()
    )
    words = [0] * (bits // 64)
    for r in rows:
        words[int(r.word)] = int(r.w)
    return words


def bloom_might_contain(
    key: Column,
    words: list[int],
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> Column:
    """True iff every one of the key's bit positions is set — the pure-JVM
    probe predicate to `.filter()` the big side with. The literal word
    array constant-folds into the plan once; each probe is an element_at +
    shift + mask."""
    if len(words) != bits // 64:
        raise ValueError(f"expected {bits // 64} words, got {len(words)}")
    arr = F.array(*[F.lit(int(w)) for w in words])
    cond: Column | None = None
    for pos in bloom_bit_positions(key, bits, hashes):
        word = F.element_at(arr, F.shiftrightunsigned(pos, 6).cast("int") + 1)
        bit = pos.bitwiseAND(F.lit(63)).cast("int")
        c = F.getbit(word, bit) == 1
        cond = c if cond is None else cond & c
    assert cond is not None
    return cond
