"""Deduplication operator family for large-scale document pipelines.

The reference's only dedupe is keyed keep-first (/root/reference/src/etl.py:33);
this module adds the content-based family a 100 TB training-data pipeline needs:

- exact_duplicates:    hash-groupBy on a normalized fingerprint (1 shuffle)
- ngram_jaccard_pairs: word n-gram shingles → exact Jaccard similarity join
- minhash_signatures / minhash_lsh_pairs: MinHash + banded LSH — the scale
  path: candidate pairs come from equality joins on band signatures, never a
  quadratic similarity join
- simhash / simhash_pairs: 28-bit SimHash with chunk-blocked Hamming join
  (pigeonhole: distance ≤ k ⇒ at least one of k+1 chunks equal)

Everything is built-in column expressions (md5 / conv / explode / higher-order
array functions) — no Python UDFs — so the hot path stays in the JVM with
whole-stage codegen, and every step is an ordinary shuffle-parallel DataFrame op.

Hashing is md5-based (not Spark's murmur3 `hash`) deliberately: md5 is defined
identically everywhere, so DuckDB oracles can replay the exact pipeline
(see plans/suite.py). 28-bit hash values keep a*h+b inside 63-bit longs —
DuckDB errors on bigint overflow while Spark wraps, so staying far from 2^63
is what makes the two engines agree.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.expr import floor_parallelism

# 2^31 - 1 (prime); hash universe for minhash permutations
MERSENNE_P = 2147483647
SIMHASH_BITS = 28


def _h28(col: F.Column) -> F.Column:
    """Deterministic 28-bit string hash: first 7 hex chars of md5 → bigint.
    Bit-identical in Spark (conv) and DuckDB ('0x'||… cast)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """(a, b) pairs for the universal-hash family h_i(x) = (a_i*x + b_i) mod p.
    Seeded and shared with the SQL oracle generator so both engines run the
    same permutations."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
        for _ in range(num_hashes)
    ]


def normalize_text(col: F.Column) -> F.Column:
    """lower + collapse whitespace + trim — the canonical form every content
    hash in this module is computed over."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: F.Column) -> F.Column:
    return F.split(normalize_text(col), " ")


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles per document.

    Built by zipping n shifted slices of the token array and concatenating
    each struct — every token-array reference sits OUTSIDE the lambda, so the
    normalize+split expression is evaluated O(n) times per ROW. The earlier
    form indexed `toks` with element_at INSIDE a transform lambda, and Spark
    re-evaluates a non-bound expression per lambda invocation: O(len·n)
    normalize+split calls per document, O(len²·n) work — measured 16.5s vs
    1.1s for the corpus shingle frame at sf0.1 (identical output). A doc with
    fewer than n tokens yields no shingles. Row count ≈ tokens per doc, so
    this explodes ~|corpus| rows — partitioned by input splits.

    The tokenize+zip kernel is CPU-bound, so the input is floored to the
    session's core count first (operators.expr.floor_parallelism): a no-op
    at production split counts, and the difference between 1 busy core and
    32 on single-row-group bench files (containment 4.1 s → 1.8 s sf0.1)."""
    df = floor_parallelism(df)
    toks = tokens(F.col(text_col))
    n_grams = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, n_grams) for k in range(n)])
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    # per-doc dedup happens BEFORE the explode via array_distinct — a local
    # array op — so the exploded frame is already (id, shingle)-distinct and
    # no shuffle is ever spent on distinctness (measured: removes a full
    # 2M-row exchange from every shingle consumer at sf0.1)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup: group by md5(normalized text).

    Returns one row per duplicated fingerprint: representative (min id),
    duplicate count, and the sorted member ids. One hash-shuffle on the
    fingerprint — at 100 TB this is the cheapest possible full-corpus dedup."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("id").alias("representative"),
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list("id")).alias("members"),
        )
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity: pairs (a < b) with
    |A∩B| / |A∪B| ≥ threshold, as (id_a, id_b, common, na, nb, jaccard).

    Two shapes, identical output on the pairs both can see:

    - ``candidates=None`` — corpus-wide all-pairs: explode shingles →
      self-equi-join on shingle → count intersections → join per-doc set
      sizes. The shingle self-join is the quadratic-risk step: this shape
      is the exact ORACLE for small corpora and pytest verification, never
      the 100 TB path.
    - ``candidates`` = (id_a, id_b) frame (e.g. from minhash LSH banding) —
      THE production shape: the shingle frame is joined once against the
      melted candidate list and intersections/unions come from grouped
      counts per candidate pair, so work is linear in |candidates| × doc
      length and the corpus-wide shingle self-join never materializes."""
    # .distinct() is a semantic no-op here (shingles are per-doc distinct
    # already) but its exchange is load-bearing: hash-partitioned on
    # (id, shingle) it is balanced even when one shingle is hot, and all
    # three consumers (sizes + both join sides) reuse it. A/B at sf0.1
    # (after the zipped-slices shingle fix made the explode ~1s): distinct
    # 2.3s ≈ no exchange 3.3s ≈ repartition(shingle) 1.9s — within run
    # variance on the raw corpus, so the skew-proof (id, shingle) layout is
    # kept for the 100 TB case where a hot shingle would gut the
    # shingle-partitioned variant. (Pre-fix the gap was 16-19s / 36-39s /
    # 21-24s because each consumer re-ran the O(len²·n) explode.)
    if candidates is not None:
        # candidate-restricted exact verify (same melt-join shape as
        # minhash_verified_pairs' counts path, but emitting the full
        # common/na/nb accounting): per-doc shingles are distinct, so in the
        # per-(pair, shingle) count c==2 ⟺ both docs contain the shingle,
        # and the number of groups is |A∪B| — intersection and union in one
        # aggregate, no shingle self-join anywhere in the plan
        sh = shingles(df, text_col, id_col, n)
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
        melt = candidates.select("id_a", "id_b").withColumn(
            "id", F.explode(F.array(F.col("id_a"), F.col("id_b")))
        )
        stats = (
            melt.join(sh, "id")
            .groupBy("id_a", "id_b", "shingle")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("union_sz"),
                F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("common"),
            )
        )
        return (
            stats.join(
                sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "na"}), "id_a"
            )
            .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "nb"}), "id_b")
            .withColumn("jaccard", F.col("common") / F.col("union_sz"))
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("id_a", "id_b", "common", "na", "nb", "jaccard")
        )
    sh = shingles(df, text_col, id_col, n).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_shingles": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_shingles": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "common", "na", "nb", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(id, mh_0 … mh_{H-1}) MinHash signature per document.

    h_i(shingle) = (a_i * h28(shingle) + b_i) mod p, minimized per doc — one
    explode + one groupBy(doc): linear in corpus size, embarrassingly
    parallel, and the signature (H longs) is all that flows downstream."""
    sh = shingles(df, text_col, id_col, n)
    h = _h28(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coefficients(num_hashes, seed))
    ]
    return sh.groupBy("id").agg(*aggs)


def _band_structs(num_hashes: int, bands: int) -> list[F.Column]:
    """(band, sig) struct per band from the mh_i signature columns — the ONE
    place the band layout (row grouping, "," separator) is defined, shared by
    every LSH consumer (batch candidates AND the persisted incremental index)
    so the layouts cannot diverge."""
    rows_per_band = num_hashes // bands
    out = []
    for bidx in range(bands):
        cols = [f"mh_{bidx * rows_per_band + r}" for r in range(rows_per_band)]
        out.append(
            F.struct(
                F.lit(bidx).alias("band"),
                F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("sig"),
            )
        )
    return out


def _lsh_candidates(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 signature band.

    One pass over sig: explode an array of (band, sig) structs — a union of
    per-band selects would re-derive the whole signature pipeline once per
    band. Shared by minhash_lsh_pairs and minhash_verified_pairs so the band
    layout (struct shape, "," separator, row grouping) cannot diverge."""
    banded = sig.select(
        "id", F.explode(F.array(*_band_structs(num_hashes, bands))).alias("bs")
    ).select("id", "bs.band", "bs.sig")
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "sig"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    min_est: float = 0.5,
    threshold: float | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs — the 100 TB dedup path.

    Candidates come from equality joins on banded signatures (bands × equality
    shuffles, each on a compact key) — never an all-pairs comparison. Estimated
    Jaccard = fraction of agreeing minhashes over the full signature; pairs
    below `min_est` are dropped (LSH false positives).

    ``threshold=t`` is the PLANNED path (VERDICT r7 #2): instead of raw
    (num_hashes, bands) knobs, derive them from the banding S-curve via
    lsh_params_for(t) — candidate probability ≥ 0.9 at jaccard = t, junk
    mass bounded at t/2 — and set ``min_est = t``, so the call returns
    pairs estimated at-or-above the threshold with a measured per-pair
    recall guarantee (tools/dedup_quality.py calibration). The raw-knob
    path is byte-identical to pre-r8 when ``threshold`` is None; passing
    both raises (the knobs would silently disagree with the plan)."""
    if threshold is not None:
        if (num_hashes, bands) != (16, 4) or min_est != 0.5:
            raise ValueError(
                "pass either threshold= (planned band structure) or raw "
                "num_hashes/bands/min_est knobs, not both"
            )
        num_hashes, bands = lsh_params_for(threshold)
        min_est = threshold
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, seed).cache()
    cand = _lsh_candidates(sig, num_hashes, bands)
    sig_a = sig.select(
        F.col("id").alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)]
    )
    sig_b = sig.select(
        F.col("id").alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)]
    )
    agree = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("est_jaccard", agree / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= F.lit(min_est))
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    ngram: int = 3,
) -> DataFrame:
    """(id, simhash) — SimHash over the distinct feature set.

    Features are word n-gram shingles by default (ngram=1 degrades to the
    distinct-token set, which is degenerate on small vocabularies: most docs
    share nearly all tokens). Bit i of the signature is the sign of
    Σ_feature (±1 by bit i of h28(feature)). One explode + one groupBy(doc);
    the per-bit sums are plain conditional aggregates, all JVM-side."""
    if ngram > 1:
        toks = shingles(df, text_col, id_col, ngram).withColumnRenamed("shingle", "tok")
    else:
        toks = floor_parallelism(df).select(
            F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
        ).distinct()
    toks = toks.withColumn("h", _h28(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    summed = toks.groupBy("id").agg(*bit_sums)
    sh = sum(
        F.when(F.col(f"s_{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0)) for i in range(bits)
    )
    return summed.select("id", sh.cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
    max_distance: int = 3,
    chunks: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs via chunk-blocked Hamming join.

    Pigeonhole blocking: hamming ≤ max_distance (< chunks) ⇒ the signatures
    agree on at least one of `chunks` bit-chunks, so candidates come from
    equality joins on (chunk_idx, chunk_value) — linear-ish, no cross join.
    Candidates are verified with bit_count(xor) ≤ max_distance."""
    assert max_distance < chunks
    sig = simhash(df, text_col, id_col, bits, ngram).cache()
    chunk_bits = bits // chunks

    # one pass over sig via struct-explode (see minhash_lsh_pairs)
    chunk_structs = []
    for cidx in range(chunks):
        width = chunk_bits if cidx < chunks - 1 else bits - chunk_bits * (chunks - 1)
        mask = (1 << width) - 1
        chunk_structs.append(
            F.struct(
                F.lit(cidx).alias("chunk"),
                F.shiftright(F.col("simhash"), cidx * chunk_bits)
                .bitwiseAND(F.lit(mask))
                .alias("cval"),
            )
        )
    chunked = sig.select(
        "id", "simhash", F.explode(F.array(*chunk_structs)).alias("cs")
    ).select("id", "simhash", "cs.chunk", "cs.cval")

    return (
        chunked.alias("x")
        .join(chunked.alias("y"), ["chunk", "cval"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.expr("sh_a ^ sh_b")),
        )
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    threshold: float = 0.5,
    verify_via: str = "sets",
    plan_bands: bool = False,
) -> DataFrame:
    """The 100 TB near-dup pipeline in one operator: MinHash-LSH candidate
    generation followed by EXACT n-gram Jaccard verification on candidates
    only — the quadratic shingle self-join never runs.

    Returns (id_a, id_b, jaccard) with exact jaccard ≥ threshold, restricted
    to pairs sharing ≥1 LSH band (recall bounded by the band structure, like
    minhash_lsh_pairs; unlike it, the reported similarity is exact, not the
    signature estimate).

    `verify_via` picks the verification join shape; both are exact and
    return identical doubles (int/int division of the same counts):
    - "sets": per-doc shingle SETS ride the candidate join as array columns;
      |intersection| is a local array_intersect — fewest shuffles, fine
      while docs are ~10^2-10^3 shingles.
    - "counts": per-doc shingle sets never leave the exploded (id, shingle)
      frame; the intersection is a grouped count over candidate-restricted
      shingle joins. Row width stays constant regardless of document length
      — the path for long documents where a whole shingle set on one row
      would blow executor memory.

    ``plan_bands=True`` (VERDICT r7 #2) derives (num_hashes, bands) from
    the verification ``threshold`` itself via lsh_params_for — candidate
    probability ≥ 0.9 for pairs AT the threshold — instead of the raw
    knobs; the verify stage stays exact either way, so the planned path
    changes only which true pairs the band join can surface (the S-curve
    floor) and how much junk the verify join absorbs."""
    if plan_bands:
        if (num_hashes, bands) != (16, 4):
            raise ValueError(
                "pass either plan_bands=True (band structure derived from "
                "threshold) or raw num_hashes/bands knobs, not both"
            )
        num_hashes, bands = lsh_params_for(threshold)
    assert num_hashes % bands == 0
    if verify_via not in ("sets", "counts"):
        raise ValueError(f"verify_via must be sets|counts, got {verify_via!r}")
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, seed)
    cand = _lsh_candidates(sig, num_hashes, bands)
    sh = shingles(df, text_col, id_col, n)
    if verify_via == "sets":
        sets = sh.groupBy("id").agg(F.collect_set("shingle").alias("sh_set"))
        a = sets.select(F.col("id").alias("id_a"), F.col("sh_set").alias("set_a"))
        b = sets.select(F.col("id").alias("id_b"), F.col("sh_set").alias("set_b"))
        inter = F.size(F.array_intersect(F.col("set_a"), F.col("set_b")))
        union = F.size(F.col("set_a")) + F.size(F.col("set_b")) - inter
        return (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .withColumn("jaccard", inter / union)
            .filter(F.col("jaccard") >= F.lit(threshold))
            .select("id_a", "id_b", "jaccard")
        )
    # counts path: the shingle frame is touched exactly ONCE. Melt each
    # candidate pair into two (id_a, id_b, id) rows, join the exploded
    # shingles on id (melt is tiny — 2×|candidates| narrow rows — so Catalyst
    # broadcasts it and the shingle scan streams map-side, no pre-shuffle),
    # then one grouped count per (pair, shingle): per-doc shingles are
    # distinct, so count==2 means both docs contain the shingle and the
    # number of (pair, shingle) groups IS |A∪B| — intersection and union in
    # the same aggregate, no sizes frame, no per-consumer recompute. (The
    # earlier shape joined the shingle frame three times — sizes + two
    # intersection sides — and recomputed the explode for each: 38s vs ~10s
    # at sf0.1.) A doc appearing in many pairs replicates its shingles per
    # pair — bounded by the LSH band structure, same factor the sets path
    # pays in its candidate join.
    melt = cand.withColumn("id", F.explode(F.array(F.col("id_a"), F.col("id_b"))))
    per_shingle = (
        melt.join(sh, "id")
        .groupBy("id_a", "id_b", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_shingle.groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("union_sz"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("inter"),
        )
        .withColumn("jaccard", F.col("inter") / F.col("union_sz"))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a near-dup
    pair list, by smallest-id label propagation. Input (id_a, id_b) edges;
    output (id, component) where component = min id reachable.

    This is the step after pair-finding in every real dedup pipeline: pairs
    say "these two match", components say "keep one representative per
    group" even when matches chain (A~B, B~C but never A~C directly).

    Each round is ONE Spark job: the propagation join computes the stepped
    labels, a POINTER-JUMP (path halving: component ← its component's
    component — the Kiveris et al. 2014 / GraphFrames trick) compresses
    label chains, the per-row changed flag compares final vs old label on
    the same row, the round's labels localCheckpoint lazily, and the
    convergence aggregate sum(chg) is the single action that materializes
    everything — no separate old-vs-new join, no second job per round.
    Plain min-propagation needs O(component diameter) rounds — and
    containment/fragment chains DO produce long paths (16 rounds measured
    on the keep-best corpus at sf0.1); with the jump each round roughly
    halves remaining chain depth, so convergence is O(log diameter)
    (6 rounds on the same corpus) — at 100 TB, synchronous rounds are the
    cost, so log beats linear exactly where it matters. Swap
    localCheckpoint for checkpoint() with a checkpoint dir on a real
    cluster."""
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    # Materialize the symmetric edge set ONCE, still under AQE (the upstream
    # pair pipeline — banded joins, df-capped shingles — wants AQE's skew
    # splitting and coalescing at scale); every loop round below reads this
    # checkpointed frame.
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    def one_round(labels: DataFrame) -> DataFrame:
        neigh = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("n_comp"))
        )
        # labels only ever decrease; carry the OLD label through both steps
        # so one flag covers propagation AND jump.
        prop = F.coalesce(neigh.n_comp, labels.component)
        # stepped is consumed twice (as itself and as the jump LUT) but is a
        # cheap join over the checkpointed labels and cached edges: computing
        # it twice inside ONE plan costs less than a second per-round
        # localCheckpoint, whose toRdd pass eagerly executes every
        # intermediate stage under AQE (round 12, measured on keep_best).
        stepped = labels.join(neigh, labels.id == neigh.src, "left").select(
            labels.id,
            F.col("component").alias("oc"),
            F.least(labels.component, prop).alias("c1"),
        )
        # pointer jump: c2 = min(c1, component-of-c1). Every label is the id
        # of a node in the same component, so the looked-up label is too —
        # the invariant the convergence proof needs survives the jump.
        lut = stepped.select(F.col("id").alias("pid"), F.col("c1").alias("pcomp"))
        return (
            stepped.join(lut, stepped.c1 == lut.pid, "left")
            .select(
                stepped.id,
                F.least(stepped.c1, F.coalesce(lut.pcomp, stepped.c1)).alias(
                    "component"
                ),
                (
                    F.least(stepped.c1, F.coalesce(lut.pcomp, stepped.c1))
                    < stepped.oc
                )
                .cast("int")
                .alias("chg"),
            )
            .localCheckpoint(eager=False)
        )

    # (Round-12 note: running the loop with AQE disabled was measured and
    # REJECTED — job count collapsed ~110 → ~21 but job time doubled: the
    # static plan loses AQE's broadcast conversion of the node-sized label
    # frames and runs three 32-partition sort-merge joins per round.)
    #
    # FUSED INIT (round 12): component_0 = min(id, min direct neighbor)
    # — exactly the state the old identity init reached after its first
    # propagation step, as ONE grouped aggregate over the checkpointed
    # edges instead of a nodes-distinct shuffle + eager checkpoint + a
    # full propagation round. Symmetric edges ⇒ every node appears as
    # src, so this covers the node set; the fixed point (min reachable
    # id) is unchanged.
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("_mn"))
        .select("id", F.least(F.col("id"), F.col("_mn")).alias("component"))
        .localCheckpoint(eager=False)
    )
    # TWO rounds per convergence action (round 12): labels decrease
    # monotonically, so "the batch's LAST round changed nothing" is the
    # same fixed-point test as the old per-round check (a no-change
    # round keeps every later round unchanged) — at worst one
    # already-converged round of extra work, for HALF the driver
    # round-trips. The sum(chg) action materializes the batch's lazy
    # checkpoints.
    converged = False
    rounds_used = 0
    while rounds_used < max_iterations:
        batch = min(2, max_iterations - rounds_used)
        for _ in range(batch):
            labels = one_round(labels)
        rounds_used += batch
        changed = labels.agg(F.sum("chg")).first()[0]
        if not changed:  # 0 or None (empty edge set)
            converged = True
            break
    if not converged:
        # partial labels would silently split true components
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (a component's diameter exceeds the cap); raise "
            "max_iterations"
        )
    return labels.select("id", "component")


def doc_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
) -> DataFrame:
    """(id, span): NON-overlapping ``span_tokens``-token windows per document
    — the unit of cross-document exact-substring dedup (the span-granular
    form of Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" / RefinedWeb's exact-substring stage, which remove
    verbatim text shared across documents that near-dup DOES NOT catch:
    boilerplate, licenses, quoted passages inside otherwise-unique docs).

    Non-overlapping windows keep the explode at ~n/span_tokens rows per doc
    (vs ~n for shingles); multiplicity is kept (a doc repeating its own span
    contributes each occurrence to its span accounting). The token array is
    materialized into a real column BEFORE the transform lambda — the same
    re-evaluation pitfall `shingles` documents (an unbound expression inside
    a lambda re-runs per invocation)."""
    w = span_tokens
    df = floor_parallelism(df)
    t = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    n_full = F.expr(f"size(t) DIV {w}")
    idx = F.when(
        F.size(F.col("t")) >= w, F.sequence(F.lit(0), n_full - 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    spans = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i * w + 1, w))
    )
    return t.select("id", F.explode(spans).alias("span"))


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    flag_bp: int = 5000,
) -> DataFrame:
    """Per-document cross-corpus duplicated-span profile:
    (id, n_spans, dup_spans, dup_bp, flagged) where a span is "duplicated"
    if it appears in >= ``min_docs`` DISTINCT documents, dup_bp is the
    duplicated fraction in integer basis points (exact — no IEEE division),
    and ``flagged`` marks docs at or above ``flag_bp`` (default: half the
    doc is boilerplate shared with other docs).

    Plan shape (100 TB): one tokenize+explode pass (~n/span_tokens rows per
    doc); ONE grouped distinct-count keyed on the 128-bit md5 of the span
    (two-level aggregate with map-side partials — the full span string never
    shuffles); ONE equality join back on the same digest key (no row
    amplification: the count side is 1 row per distinct span; the classic
    hot boilerplate span is exactly the skewed key AQE skew-join splits);
    ONE per-doc grouped count. Linear end to end, no all-pairs anywhere —
    the property that makes exact-substring dedup runnable where the
    suffix-array formulation is not. Docs shorter than one span emit no rows
    (nothing to dedup). md5 keying keeps the pipeline bit-replayable in SQL
    (module convention)."""
    sp = doc_spans(df, text_col, id_col, span_tokens)
    fp = sp.select("id", F.md5(F.col("span")).alias("fp"))
    counts = fp.groupBy("fp").agg(F.countDistinct("id").alias("n_docs"))
    flags = fp.join(counts, "fp")
    per_doc = flags.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum((F.col("n_docs") >= min_docs).cast("long"))
        .cast("long")
        .alias("dup_spans"),
    )
    return per_doc.select(
        "id",
        "n_spans",
        "dup_spans",
        F.expr("CAST(dup_spans * 10000 DIV n_spans AS BIGINT)").alias("dup_bp"),
        (F.expr("dup_spans * 10000 DIV n_spans") >= flag_bp).alias("flagged"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    min_docs: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL — the cleaning half of
    duplicate_span_stats (Lee et al. 2022 exact-substring dedup as applied
    by RefinedWeb/Dolma: don't drop the document, CUT the boilerplate):
    each doc's normalized text is rebuilt from its non-overlapping
    ``span_tokens``-token windows with every span that appears in
    ≥ ``min_docs`` DISTINCT documents removed; the sub-window tail (and
    docs shorter than one window) always survives. ``keep_first=True``
    keeps one canonical copy corpus-wide — the occurrence in the LOWEST
    doc id — so shared text is deduplicated, not eradicated.

    Output: (id, n_spans, kept_spans, text_clean) — every input doc
    appears; text_clean is the space-joined kept spans in original order,
    then the tail.

    Plan shape (100 TB): duplicate_span_stats' linear pipeline plus one
    ordered per-doc rebuild — one tokenize pass, ONE digest-keyed aggregate
    (count-distinct + min id, map-side partials; the span string never
    shuffles beyond its doc), one digest join back, and a per-doc
    collect_list bounded by doc length (array-local sort on span position,
    never a global sort). No all-pairs anywhere."""
    w = span_tokens
    df = floor_parallelism(df)
    t = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    n_full = F.expr(f"size(t) DIV {w}")
    idx = F.when(
        F.size(F.col("t")) >= w, F.sequence(F.lit(0), n_full - 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    spans = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.concat_ws(" ", F.slice(F.col("t"), i * w + 1, w)).alias("span"),
        ),
    )
    tail = F.expr(
        f"concat_ws(' ', slice(t, (size(t) DIV {w}) * {w} + 1, "
        f"size(t) - (size(t) DIV {w}) * {w}))"
    )
    base = t.select("id", n_full.cast("long").alias("n_spans"), tail.alias("tail"))
    sp = t.select("id", F.explode(spans).alias("s")).select(
        "id", "s.pos", F.md5(F.col("s.span")).alias("fp"), "s.span"
    )
    counts = sp.groupBy("fp").agg(
        F.countDistinct("id").alias("n_docs"), F.min("id").alias("first_id")
    )
    drop = (F.col("n_docs") >= min_docs) & (
        F.lit(not keep_first) | (F.col("id") != F.col("first_id"))
    )
    kept = sp.join(counts, "fp").filter(~drop)
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("kept_spans"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("body"),
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        "n_spans",
        F.coalesce(F.col("kept_spans"), F.lit(0)).cast("long").alias("kept_spans"),
        F.concat_ws(
            " ", F.nullif(F.coalesce(F.col("body"), F.lit("")), F.lit("")),
            F.nullif(F.col("tail"), F.lit("")),
        ).alias("text_clean"),
    )


def incremental_span_decisions(
    index_spans: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    max_dup_bp: int = 5000,
) -> tuple[DataFrame, DataFrame]:
    """Side-effect-free core of `incremental_span_dedup`: given the
    persisted span-digest rows (fp, id) of every previously ACCEPTED doc
    (or None for a fresh index), decide each batch doc — REJECT iff the
    fraction of its spans already present in the index OR in a lower-id
    batch doc reaches ``max_dup_bp`` basis points (the duplicate_span_stats
    flag rule applied at ingest time). Returns (decisions, accepted_spans)
    without writing anything.

    decisions: (id, accepted, n_spans, dup_spans, dup_bp) — docs shorter
    than one span window have nothing to match and are always accepted
    (n_spans 0, dup_bp 0); they also append nothing, so re-ingest stays
    idempotent for them too (spanful docs self-match at 10000 bp on
    re-ingest and are rejected).

    Scale shape (the incremental_minhash_decisions discipline): the
    batch's span/digest work is linear in the batch; the index side is ONE
    equality semi-join restricted by the BROADCAST batch digest set before
    its distinct — the 100 TB index never shuffles by value, and data
    written per snapshot is one row per accepted doc's distinct span."""
    sp = doc_spans(batch, text_col, id_col, span_tokens)
    # one lazy checkpoint: the occurrence frame feeds the per-fp lookup,
    # the flag join, AND the accepted-spans append — separate actions
    # would each re-run the tokenize+window pass
    occ = sp.select("id", F.md5("span").alias("fp")).localCheckpoint(eager=False)
    fp_min = occ.groupBy("fp").agg(F.min("id").alias("first_id"))
    if index_spans is not None:
        idx_hit = (
            index_spans.join(F.broadcast(fp_min.select("fp")), "fp", "left_semi")
            .select("fp")
            .distinct()
            .withColumn("in_index", F.lit(True))
        )
        lookup = fp_min.join(idx_hit, "fp", "left")
    else:
        lookup = fp_min.withColumn("in_index", F.lit(False))
    flagged = occ.join(F.broadcast(lookup), "fp")
    dup = F.coalesce(F.col("in_index"), F.lit(False)) | (
        F.col("first_id") < F.col("id")
    )
    per = flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(dup.cast("long")).cast("long").alias("dup_spans"),
    )
    decisions = (
        batch.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
        )
        .withColumn(
            "dup_bp",
            F.expr(
                "CASE WHEN n_spans > 0 THEN dup_spans * 10000 DIV n_spans "
                "ELSE 0 END"
            ).cast("long"),
        )
        .withColumn("accepted", F.col("dup_bp") < max_dup_bp)
        .select("id", "accepted", "n_spans", "dup_spans", "dup_bp")
        # lazy checkpoint, same rationale as minhash's `best`: the caller's
        # corpus commit, the accepted-spans append, and the gate's own read
        # are separate actions that would each re-run the flag/rollup chain
        .localCheckpoint(eager=False)
    )
    accepted_spans = occ.dropDuplicates(["id", "fp"]).join(
        F.broadcast(decisions.filter(F.col("accepted")).select("id")),
        "id",
        "left_semi",
    ).select("fp", "id")
    return decisions, accepted_spans


def incremental_span_dedup(
    index,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    max_dup_bp: int = 5000,
) -> DataFrame:
    """Exact-substring dedup at INGEST time — the span-granular sibling of
    incremental_minhash_dedup (Lee et al. 2022 applied the RefinedWeb way:
    snapshots arrive over weeks, and a new doc whose text is mostly spans
    the corpus already holds is boilerplate/recycled content to drop).
    ``index`` is a sources.txtable.TxTable holding `(fp, id)` — one row
    per distinct 8-token span of every previously accepted doc. A batch
    doc is rejected when ≥ ``max_dup_bp``/10000 of its spans match the
    index or a lower-id batch doc (greedy keep-first, the minhash twin's
    convention); survivors' distinct span digests append. Returns one
    decision row per batch doc: (id, accepted, n_spans, dup_spans,
    dup_bp). Re-ingesting a batch admits only its span-less docs
    (everything else self-matches at 10000 bp) — pytest-pinned."""
    decisions, accepted_spans = incremental_span_decisions(
        index.snapshot() if index.exists() else None,
        batch,
        text_col,
        id_col,
        span_tokens,
        max_dup_bp,
    )
    index.append(accepted_spans)
    return decisions


def prefix_filter_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold_num: int = 7,
    threshold_den: int = 10,
    _sh: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, na, nb): EVERY pair that can possibly reach shingle-set
    Jaccard ≥ threshold_num/threshold_den — the prefix-filtering
    candidate join of PPJoin (Xiao et al. 2008 / SSJoin, Chaudhuri 2006):
    the EXACT-guarantee alternative to MinHash-LSH banding (which trades
    recall probabilistically).

    Why it is complete: order every doc's shingle set by ascending global
    frequency (rare first); if two sets share NO token in their first
    L = |s| - ceil(t·|s|) + 1 tokens, their overlap is at most
    min(|A|,|B|) - L < t·max — so any qualifying pair MUST collide on a
    prefix token. The length filter (t·|a| ≤ |b| ≤ |a|/t) prunes the rest.
    Thresholds are exact rationals, so the prefix lengths and filters are
    integer arithmetic a SQL oracle replays.

    Scale shape (100 TB): one shingle pass + one frequency count; the
    per-doc ordering is an ARRAY-LOCAL sort (collect_list bounded by doc
    length, never a global sort); candidates come from an equality
    self-join on PREFIX tokens — which are by construction the RAREST
    tokens in each doc, exactly inverting the hot-key risk a naive
    token self-join has. No LSH tuning, no false negatives. ``_sh`` lets
    the verify composition hand in an already-materialized shingle frame
    instead of re-running the tokenizer."""
    sh = shingles(df, text_col, id_col, n) if _sh is None else _sh
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
    ranked = sh.join(freq, "shingle")
    arr = ranked.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("f", "shingle"))).alias("arr"),
        F.count(F.lit(1)).alias("sz"),
    )
    plen = F.expr(
        f"sz - ((({threshold_num} * sz) + {threshold_den} - 1)"
        f" DIV {threshold_den}) + 1"
    )
    pref = arr.select(
        "id",
        "sz",
        F.explode(
            F.transform(F.slice("arr", F.lit(1), plen), lambda x: x["shingle"])
        ).alias("shingle"),
    )
    a = pref.select(
        F.col("id").alias("id_a"), F.col("sz").alias("na"), "shingle"
    )
    b = pref.select(
        F.col("id").alias("id_b"), F.col("sz").alias("nb"), "shingle"
    )
    return (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("nb") * threshold_den >= F.col("na") * threshold_num)
            & (F.col("na") * threshold_den >= F.col("nb") * threshold_num)
        )
        .select("id_a", "id_b", "na", "nb")
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 1,
    threshold_num: int = 7,
    threshold_den: int = 10,
) -> DataFrame:
    """EXACT similarity join: all pairs with shingle-set Jaccard ≥
    threshold_num/threshold_den, via prefix-filter candidates + a
    candidate-restricted grouped-count verify (the melt shape the LSH
    verify uses). Output (id_a, id_b, common, na, nb, jaccard_bp); the
    threshold predicate is the exact integer cross-multiplication
    common·den ≥ num·union — no float ever decides membership.

    The shingle frame is lazily checkpointed and shared between the
    candidate build (frequencies, prefixes) and the verify melt — the
    tokenizer and explode run ONCE, not once per consumer."""
    sh = shingles(df, text_col, id_col, n).localCheckpoint(eager=False)
    cand = prefix_filter_candidates(
        df, text_col, id_col, n, threshold_num, threshold_den, _sh=sh
    )
    melt = cand.withColumn(
        "id", F.explode(F.array(F.col("id_a"), F.col("id_b")))
    )
    stats = (
        melt.join(sh, "id")
        .groupBy("id_a", "id_b", "na", "nb", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(
            F.count(F.lit(1)).alias("union_sz"),
            F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).alias("common"),
        )
    )
    return (
        stats.filter(
            F.col("common") * threshold_den >= F.col("union_sz") * threshold_num
        )
        .select(
            "id_a",
            "id_b",
            F.col("common").cast("long").alias("common"),
            F.col("na").cast("long").alias("na"),
            F.col("nb").cast("long").alias("nb"),
            F.expr("CAST(common * 10000 DIV (na + nb - common) AS BIGINT)").alias(
                "jaccard_bp"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_containment_bp: int = 8000,
    max_df: int = 16,
) -> DataFrame:
    """(id_a, id_b, common, na, nb, cont_a_bp, cont_b_bp): ASYMMETRIC shingle
    containment — C(A→B) = |A∩B| / |A| — for pairs where either direction
    reaches ``min_containment_bp`` basis points. The quote-inclusion /
    fragment detector Jaccard dedup is structurally blind to: a document
    fully CONTAINED in a much larger one has Jaccard ≈ |A|/|B| (arbitrarily
    low, below every dedup threshold) while its containment is 10000 bp —
    and MinHash-LSH candidates inherit the same blindness because banding
    probability tracks Jaccard. Lee et al. 2022 (dedup) motivates exactly
    this gap for quoted/boilerplate-wrapped training text.

    Shape (the multimodal cdc_neardup contract, applied to text shingles):
    the shingle universe is first capped at document frequency ``max_df``
    (a shingle shared by more docs than that is corpus boilerplate, not
    containment evidence — and it is also precisely the join key that
    would go quadratic); ONE equality join on the capped shingles builds
    per-pair intersections, and per-doc set sizes are counted over the SAME
    capped universe, so the containment definition is self-consistent.
    Work is bounded by Σ_shingle df² ≤ max_df · |shingle occurrences| —
    LINEAR in corpus size times the cap, never corpus². All scores are
    integral-DIV basis points (no IEEE division anywhere)."""
    sh = shingles(df, text_col, id_col, n)
    # ROUND-12 RESHAPE (guide §2.4 — remove shuffles outright): ONE grouped
    # aggregate replaces the dfreq + cap-join + a⋈b self-join chain. The
    # shingle table shuffles ONCE (by shingle); the df cap is a filter on
    # the collected id-list length (shingles are (id, shingle)-distinct, so
    # list length == the old count(*) df); sizes and pair counts both read
    # the SAME exchange (ReusedExchange — the old shape re-ran the shingle
    # explode per consumer: dfreq's agg exchange and the cap-join exchange
    # partition differently, so each re-scanned the corpus). Pair
    # generation is ARRAY-LOCAL over the ≤ max_df sorted ids (the
    # copurchase_edges trick): id_a < id_b by construction, ≤ C(max_df, 2)
    # pairs per shingle — identical (id_a, id_b, common) to the equality
    # self-join, with two exchanges and two corpus re-scans removed.
    # Measured at sf0.1: dedup_containment 4.59 s → see OPTIMIZATION_r12.md.
    grouped = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") <= max_df)
    )
    sizes = (
        grouped.select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("nsh"))
    )
    m = F.size(F.col("ids"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, m - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    common = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(
            sizes.withColumnsRenamed({"id": "id_a", "nsh": "na"}), "id_a"
        )
        .join(sizes.withColumnsRenamed({"id": "id_b", "nsh": "nb"}), "id_b")
        .withColumn("cont_a_bp", F.expr("common * 10000 DIV na"))
        .withColumn("cont_b_bp", F.expr("common * 10000 DIV nb"))
        .filter(
            (F.col("cont_a_bp") >= min_containment_bp)
            | (F.col("cont_b_bp") >= min_containment_bp)
        )
        .select("id_a", "id_b", "common", "na", "nb", "cont_a_bp", "cont_b_bp")
    )


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) dedup — the RefinedWeb/Dolma-style ingest shape
# ---------------------------------------------------------------------------

def band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, sig, mh) LSH band rows carrying the FULL signature as an
    array — the persisted-index row format for incremental dedup. Carrying
    `mh` denormalized (×bands) lets an index probe verify estimated Jaccard
    in the SAME equality join that finds the candidate: no second lookup
    against a signature table, so a new batch costs one broadcast-able join
    against the index scan. Band layout comes from `_band_structs`, shared
    with `_lsh_candidates`, so batch and index bands cannot diverge."""
    return sig.select(
        "id",
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("mh"),
        F.explode(F.array(*_band_structs(num_hashes, bands))).alias("bs"),
    ).select("id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"), "mh")


def _est_jaccard(mh_a: F.Column, mh_b: F.Column, num_hashes: int) -> F.Column:
    agree = F.aggregate(
        F.zip_with(mh_a, mh_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return agree / F.lit(float(num_hashes))


def incremental_minhash_dedup(
    index,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    min_est: float = 0.5,
    threshold: float | None = None,
) -> DataFrame:
    """Dedupe a NEW batch against a persisted MinHash band index WITHOUT
    recomputing the corpus side, admit the survivors, and grow the index
    append-only — the production ingest shape (RefinedWeb/Dolma): snapshots
    arrive over weeks and the already-ingested corpus must never be
    re-shingled.

    ``index`` is a sources.txtable.TxTable holding `band_rows` of every
    previously ACCEPTED doc ((band, sig, id, mh) — created on first use).
    A batch doc is REJECTED iff it has a verified match (estimated Jaccard
    ≥ ``min_est`` over the full signature) against (a) an index doc or
    (b) a lower-id doc of the same batch — the standard greedy keep-first
    approximation, identical to what a from-scratch LSH pass over
    index ∪ batch with keep-first representatives admits on dup-free
    snapshots.

    Returns one decision row per batch doc:
        (id, accepted, matched_id, est_jaccard)
    where matched_id/est_jaccard describe the smallest-id verified match
    (NULL for accepted docs). Appends the accepted docs' band rows to the
    index before returning; re-ingesting the same batch then admits zero
    docs (every doc self-matches at est 1.0) — pytest-pinned.

    Scale shape: batch cost only. The batch's shingle/signature work is
    linear in the batch; the index side is ONE equality join of the (small)
    batch band rows against the index scan — Spark broadcasts the batch
    side, so the 100 TB index never shuffles, and data written per snapshot
    is `bands` rows per accepted doc.

    ``threshold=t`` derives (num_hashes, bands) via lsh_params_for(t) and
    sets ``min_est = t`` (VERDICT r7 #2), exactly as minhash_lsh_pairs.
    The same threshold must be passed on EVERY snapshot of one index — the
    persisted band rows are keyed by the band structure, so mixing configs
    across snapshots would make old rows unmatchable (same contract as the
    raw knobs, which also must not change mid-index)."""
    if threshold is not None:
        if (num_hashes, bands) != (16, 4) or min_est != 0.5:
            raise ValueError(
                "pass either threshold= (planned band structure) or raw "
                "num_hashes/bands/min_est knobs, not both"
            )
        num_hashes, bands = lsh_params_for(threshold)
        min_est = threshold
    decisions, accepted_bands = incremental_minhash_decisions(
        index.snapshot() if index.exists() else None,
        batch,
        text_col,
        id_col,
        n,
        num_hashes,
        bands,
        seed,
        min_est,
    )
    index.append(accepted_bands)
    return decisions


def incremental_minhash_decisions(
    index_bands: DataFrame | None,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    seed: int = 42,
    min_est: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Side-effect-free core of `incremental_minhash_dedup`: given the
    persisted band rows (or None for a fresh index), returns
    (decisions, accepted_bands) without writing anything — the streaming
    ingest loop (streaming/ingest.py) needs the split so the corpus and
    index commits can each carry their own exactly-once epoch guard."""
    # ONE lazy checkpoint on the signatures: they feed the index join, the
    # in-batch self-join, the decisions frame AND the accepted-bands append
    # — materialized by SEPARATE actions (the index commit, the caller's
    # decisions read, the streaming loop's dual commits), each of which
    # would otherwise re-run the full shingle+minhash pass over the batch
    sig = minhash_signatures(
        batch, text_col, id_col, n, num_hashes, seed
    ).localCheckpoint(eager=False)
    b = band_rows(sig, num_hashes, bands)

    matches = []
    if index_bands is not None:
        # deliberately NO scan-width floor on the index side (unlike the
        # semantic twin, where 64-term cosine chains made a 2-file index
        # scan the bottleneck): band matching is an equality join whose
        # per-candidate work is O(1), so the floor's repartition is pure
        # overhead at young-index sizes — measured +1.3 s/+2.9 s on the
        # batch/streaming ingest gates at sf0.1, no sf1 benefit (9.4 s
        # either way)
        idx = index_bands.select(
            "band",
            "sig",
            F.col("id").alias("matched_id"),
            F.col("mh").alias("mh_i"),
        )
        # NO per-pair dropDuplicates (round 13): a pair matching in k bands
        # yields k rows with IDENTICAL est (est is a function of the two
        # full signatures, which every band row carries), and the only
        # consumer is `best`'s min(struct(matched_id, est)) — insensitive
        # to multiplicity. The (id, matched_id) exchange was one full
        # query stage per micro-batch for a provable no-op.
        matches.append(
            b.join(idx, ["band", "sig"])
            .select(
                "id",
                "matched_id",
                _est_jaccard(F.col("mh"), F.col("mh_i"), num_hashes).alias("est"),
            )
        )
    lo = b.select(
        "band", "sig", F.col("id").alias("matched_id"), F.col("mh").alias("mh_i")
    )
    matches.append(
        b.join(lo, ["band", "sig"])
        .filter(F.col("matched_id") < F.col("id"))
        .select(
            "id",
            "matched_id",
            _est_jaccard(F.col("mh"), F.col("mh_i"), num_hashes).alias("est"),
        )
    )
    verified = matches[0]
    for m in matches[1:]:
        verified = verified.unionByName(m)
    # ONE lazy checkpoint on the verified-best frame too: `decisions` and
    # `accepted_bands` both consume it, and the streaming loop's dual
    # epoch-guarded commits act on those SEPARATELY — without this the
    # index join + in-batch self-join + est-verify groupBy ran once per
    # commit (measured: the 3-trigger drain spends ~3.1 s/trigger, most of
    # it this frame evaluated twice; round 11, VERDICT r10 #6)
    best = (
        verified.filter(F.col("est") >= F.lit(min_est))
        .groupBy("id")
        .agg(F.min(F.struct("matched_id", "est")).alias("m"))
        .localCheckpoint(eager=False)
    )
    decisions = (
        sig.select("id")
        .join(best, "id", "left")
        .select(
            "id",
            F.col("m").isNull().alias("accepted"),
            F.col("m.matched_id").alias("matched_id"),
            F.col("m.est").alias("est_jaccard"),
        )
    )
    accepted_bands = b.join(best, "id", "left_anti").select("band", "sig", "id", "mh")
    return decisions, accepted_bands


def lsh_params_for(
    threshold: float,
    min_recall: float = 0.9,
    max_fp_weight: float = 0.2,
    max_hashes: int = 256,
) -> tuple[int, int]:
    """Pick (num_hashes, bands) from the banding S-curve for a dedup
    threshold — the knob the measured frontier (tools/dedup_quality.py,
    PLANS.md §near-dup quality) showed matters: the module default (16, 4)
    retrieves 95%+ of j ≥ 0.8 pairs but only ~73% at j = 0.5.

    Returns the cheapest signature (fewest total hashes = bands × rows;
    ties → more rows per band, i.e. fewer false positives) such that
    P(candidate | j = threshold) = 1 − (1 − t^r)^b ≥ min_recall — an
    AT-THRESHOLD floor, stricter than aggregate recall over a pair
    population that mostly sits above the threshold — while the candidate
    probability at j = threshold/2 (junk mass the verify stage absorbs)
    stays ≤ max_fp_weight. Per-pair Bernoulli over the hash family, so
    the guarantee holds at any corpus size. Measured calibration: the
    harness's bucket recall matches these formulas within ~0.02 at sf0.1
    (e.g. (16, 4) predicts 0.911 on [0.8, 0.9); measured 0.916)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if not 0.0 < min_recall < 1.0:
        raise ValueError(f"min_recall must be in (0, 1), got {min_recall}")
    best: tuple[int, int, int] | None = None  # (total, -rows, bands)
    for rows in range(1, 33):
        # smallest band count that clears min_recall at this row width:
        # 1-(1-t^r)^b >= R  ⟺  b >= log(1-R) / log(1-t^r)
        p = threshold**rows
        if p >= 1.0 or p <= 0.0:
            continue
        # log1p keeps the denominator nonzero for tiny p (threshold**rows
        # underflows 1.0 - p to 1.0 at low thresholds — found by the r9
        # Pipeline facade's eager validation test at t=0.05)
        bands = math.ceil(math.log(1.0 - min_recall) / math.log1p(-p))
        if bands < 1 or rows * bands > max_hashes:
            continue
        fp = 1.0 - (1.0 - (threshold / 2.0) ** rows) ** bands
        if fp > max_fp_weight:
            continue
        cand = (rows * bands, -rows, bands)
        if best is None or cand < best:
            best = cand
    if best is None:
        raise ValueError(
            f"no config with <= {max_hashes} hashes reaches recall "
            f"{min_recall} at threshold {threshold} with false-positive "
            f"weight <= {max_fp_weight} at j = threshold/2"
        )
    total, _neg_rows, bands = best
    return total, bands
