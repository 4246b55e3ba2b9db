"""Similarity search over embedding columns (`array<float>`).

No reference counterpart (/root/reference has no vector data); this is the
training-data-pipeline extension family over the driver's `embeddings` table:

- exact brute-force cosine top-k — the correctness baseline;
- random-hyperplane (sign) LSH bucketing — the 100 TB path: candidate
  generation is an equality join on band signatures, so the quadratic
  similarity join never materializes;
- embedding-cosine near-duplicate pairs — dedup via the same LSH blocking.

Determinism contract (same discipline as operators/dedup.py): every floating
step is an identical IEEE-double op sequence in Spark and in the DuckDB oracle.
Dot products are sequential left folds (`F.aggregate` ≡ DuckDB `list_reduce`),
never `numpy.dot` (pairwise/SIMD summation reorders additions). Hyperplanes are
±1.0 constants from a seeded LCG shared between both engines, so multiplying by
them is exact.

Scale notes (100 TB):
- brute-force top-k is a broadcast nested loop: the query set is tiny and
  broadcast; the corpus streams through one projection + TakeOrdered per query
  — no shuffle of the corpus, no driver collect.
- LSH bucketing shuffles only (id, band, sig) triples — a few dozen bytes/row
  — then joins candidates back to vectors by id. Banding keeps bucket sizes
  bounded; skewed buckets are handled by AQE skew-join splitting.
- the built-in sequential fold keeps everything in whole-stage codegen; a
  numpy-batched `mapInPandas` variant would win raw FLOPs but leaves codegen,
  loses the oracle's bit-exactness, and only pays off above ~10^3 dims.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators.expr import floor_parallelism

LSH_SEED = 0x5EED
# 32 planes / 4 bands = 8 sign bits per band: two unrelated vectors collide on
# a band w.p. ~2^-8, so the candidate set stays ~1% of all pairs; a 0.9-cosine
# near-dup pair still shares ≥1 band w.p. ~0.8 (per-bit agreement 1 - θ/π).
# This family is calibrated for NEAR-DUP DETECTION (θ small) and stays the
# default for embedding_near_dup_pairs.
DEFAULT_PLANES = 32
DEFAULT_BANDS = 4
# Retrieval-tuned family for lsh_topk (MEASURED, tools/ann_recall.py r7):
# top-k neighbors on weakly-structured data sit at cosine ~0.3-0.5 (per-bit
# agreement ~0.6-0.67), where 8-bit bands almost never collide — recall@10
# was 0.076 at 32/4. Four-bit bands × 16 tables measured 0.915; the flip
# side is a large candidate fraction (~2^-4 per band × 16 bands) — on
# isotropic data sign-LSH prunes little, and pruning improves exactly as
# the corpus's neighbor structure sharpens (clustered corpora: see the
# pytest floors). Frontier table: PLANS.md §ANN recall.
TOPK_PLANES = 64
TOPK_BANDS = 16

# auto assign_via promotes to the Arrow-GEMM assignment above this many
# centroids (VERDICT r7 #6): the 14.8x A/B was measured at k=800, and the
# fold interpreter's per-row O(k) cost crosses the Arrow transfer overhead
# in the low hundreds; oracle-replayed gates pass literal/broadcast
# explicitly to stay bit-exact at every scale (see _assign_clusters).
GEMM_AUTO_CENTROIDS = 512


# ---------------------------------------------------------------------------
# deterministic hyperplane family (shared with the SQL oracle)
# ---------------------------------------------------------------------------

def hyperplane_signs(num_planes: int, dim: int, seed: int = LSH_SEED) -> list[list[float]]:
    """±1.0 hyperplane matrix from a glibc-constant LCG — reproducible anywhere."""
    x = seed & 0x7FFFFFFF
    planes: list[list[float]] = []
    for _ in range(num_planes):
        row: list[float] = []
        for _ in range(dim):
            x = (1103515245 * x + 12345) & 0x7FFFFFFF
            row.append(1.0 if (x >> 16) & 1 else -1.0)
        planes.append(row)
    return planes


# ---------------------------------------------------------------------------
# column-level building blocks (exact, fold-ordered)
# ---------------------------------------------------------------------------

def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double: (((0+x1)+x2)+...).

    Element products are float32*float32 computed in double — exact (48-bit
    mantissa); the fold order is the determinism contract with the oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_const(a: Column, plane: list[float]) -> Column:
    """Dot with a constant ±1 hyperplane (exact: multiplying by ±1.0)."""
    return F.aggregate(
        F.zip_with(
            a,
            F.array(*[F.lit(v) for v in plane]),
            lambda x, y: x.cast("double") * y,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null (not NaN) for a zero vector."""
    return dot(a, b) / F.nullif(F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0.0))


def cosine_prenormed(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine() with the norms supplied (precomputed per row / as literals):
    same null-not-NaN zero-vector convention and multiply order, so values
    stay bit-identical to the inline form — the single definition both
    norm-precomputing call sites must share."""
    return dot(a, b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def band_signatures(
    vec_col: str, planes: list[list[float]], bands: int
) -> list[Column]:
    """One small-int signature per band: `bands` groups of sign bits packed
    little-endian (bit r of band b = sign of plane b*rpb+r).

    The per-plane dots stay FOLDS (aggregate/zip_with) deliberately: an
    experiment replacing them with unrolled 64-term SQL chains (sign-exact,
    each chain its own projection column) ballooned the plan to 2 MiB task
    binaries and quintupled the LSH gate (4.6 s → 19.2 s at sf0.1) — plan
    size and codegen compile time dwarf the interpreted-fold cost at this
    plane count.

    But the folds are SERVER-PARSED (one F.expr string per band — the
    operators/pq._block_dist lesson): building the r7 64-plane retrieval
    family Column-by-Column cost ~9 s of driver py4j round trips PER PLAN
    (64 planes × 64 F.lit calls each, twice per gate — measured as the
    ann_lsh_topk bench setup span). The parsed AST — fold over a
    double-array literal with CAST(x AS DOUBLE) * y — is node-identical to
    the Column form, so dots and sign bits stay bit-equal to the oracle."""
    num_planes = len(planes)
    rpb = num_planes // bands

    def dot_sql(plane: list[float]) -> str:
        arr = "array(" + ",".join(f"{float(v)!r}D" for v in plane) + ")"
        return (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
        )

    sigs = []
    for b in range(bands):
        terms = [
            f"(CASE WHEN {dot_sql(planes[b * rpb + r])} >= 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(rpb)
        ]
        sigs.append(F.expr(" + ".join(terms)))
    return sigs


def probe_band_signatures(
    vec_col: str, planes: list[list[float]], bands: int, n_flips: int
) -> list[Column]:
    """Multi-probe signature arrays, one array<int> per band: the base sign
    signature FIRST, then ``n_flips`` single-bit flips at the bits whose
    hyperplane dot is nearest zero (smallest |dot|, ties to the lower bit
    index) — Lv et al. 2007 multi-probe LSH. A vector close to a band
    boundary probably differs from its true neighbors in exactly the
    near-boundary bit, so probing those flipped buckets recovers recall
    that would otherwise require more hash tables (more bands = more
    corpus-side rows). Query-side only — the corpus is hashed once with
    the plain base signatures.

    Same server-parsed fold construction as band_signatures (the dots are
    bit-identical), so a SQL oracle replays the margins, the (m, i)
    struct sort, and the XOR flips exactly."""
    num_planes = len(planes)
    rpb = num_planes // bands
    if not 0 <= n_flips <= rpb:
        raise ValueError(f"n_flips must be in [0, {rpb}], got {n_flips}")

    def dot_sql(plane: list[float]) -> str:
        arr = "array(" + ",".join(f"{float(v)!r}D" for v in plane) + ")"
        return (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
        )

    # ROUND-12 RESHAPE (the expr.let discipline, applied in SQL): the r10
    # form inlined every plane dot THREE times per band — in the base
    # signature, in each |dot| margin struct, and again inside the flip
    # lambda — so one probe column carried ~3·rpb 64-element folds as TEXT
    # (driver analysis + codegen grow with it) and evaluated the base's rpb
    # folds once per flip per ROW (HOF bodies are outside codegen CSE).
    # Binding the rpb dots ONCE as a lambda variable (transform over a
    # 1-struct array) makes base, margins and flips O(1) loads over the
    # same doubles — values bit-identical (same fold, same sort, same XOR),
    # expression text and per-row fold count cut ~3x. Measured on
    # pipeline_facade_v3's semantic stage (45/5-f2 banding).
    out = []
    for b in range(bands):
        dots = ", ".join(dot_sql(planes[b * rpb + r]) for r in range(rpb))
        base = " + ".join(
            f"(CASE WHEN element_at(v.ds, {r + 1}) >= 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(rpb)
        )
        margs = ", ".join(
            f"struct(abs(element_at(v.ds, {r + 1})) AS m, {r} AS i)"
            for r in range(rpb)
        )
        out.append(
            F.expr(
                f"element_at(transform(array(named_struct('ds', array({dots}))), "
                f"v -> concat(array({base}), "
                f"transform(slice(array_sort(array({margs})), 1, {n_flips}), "
                f"s -> CAST(({base}) AS INT) ^ CAST(shiftleft(1, s.i) AS INT)))), 1)"
            )
        )
    return out


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (self excluded). Output: (query_id, neighbor_id,
    cosine, rank).

    The query side is broadcast — the corpus is scanned once with no shuffle;
    the per-query ranking shuffles only (query_id, neighbor_id, cosine).

    GUARDED ALL-PAIRS PLAN: this is the exact oracle baseline for the ANN
    family (LSH / IVF / k-means / PQ-ADC / IVF-PQ are the scale paths), and
    its cost is corpus × queries BY DESIGN. To keep that shape from sneaking
    into a 100 TB job, the operator refuses when corpus·queries exceeds
    ``max_pairs`` (default 5e7 — minutes, not days, on one box); callers who
    really want the exact scan pass ``max_pairs=None`` explicitly. The two
    guard counts are column-pruned metadata-cheap scans."""
    if max_pairs is not None:
        nc, nq = corpus.count(), queries.count()
        if nc * nq > max_pairs:
            raise ValueError(
                f"cosine_topk is a brute-force all-pairs plan: corpus({nc}) x "
                f"queries({nq}) = {nc * nq} pairs exceeds max_pairs={max_pairs}. "
                "Use the ANN operators (ivf_topk / pq_adc_topk / lsh_topk) at "
                "this scale, or pass max_pairs=None to force the exact scan."
            )
    # norms are precomputed per ROW on each side (bit-identical to the
    # per-pair form: same fold, same sqrt) — the inline cosine() would
    # re-fold dot(q,q) and dot(c,c) once per PAIR, tripling the flops of
    # the corpus scan; the corpus side is floored to core-count parallelism
    # because the fold kernel is CPU-bound and single-row-group bench files
    # scan as one task
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("q_norm"),
        )
    )
    c = floor_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("c_norm"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_prenormed(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_pairs: int | None = 50_000_000,
) -> DataFrame:
    """Exact brute-force squared-L2 top-k: for each query vector, the k
    NEAREST corpus vectors (self excluded). Output: (query_id, neighbor_id,
    l2sq, rank). This is the metric-matched truth baseline for the ADC
    rankers (pq_adc_topk / ivf_pq_topk approximate L2, not cosine — scoring
    them against cosine truth would conflate quantization loss with the
    metric mismatch; see PLANS.md §ANN recall), and the l2 twin of
    cosine_topk: broadcast query side, one corpus scan, the same all-pairs
    guard, ranking ties broken by (l2sq asc, neighbor_id asc).

    Bit-exactness: the distance is a fixed-order fold of (a-b)^2 terms in
    double from a 0.0 accumulator — IEEE-identical to DuckDB's list_reduce
    first-element fold because 0.0 + x == x for the non-negative squared
    terms (the same argument _coarse_assign documents)."""
    if max_pairs is not None:
        nc, nq = corpus.count(), queries.count()
        if nc * nq > max_pairs:
            raise ValueError(
                f"l2_topk is a brute-force all-pairs plan: corpus({nc}) x "
                f"queries({nq}) = {nc * nq} pairs exceeds max_pairs={max_pairs}. "
                "Use the ANN operators (ivf_topk / pq_adc_topk / lsh_topk) at "
                "this scale, or pass max_pairs=None to force the exact scan."
            )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = floor_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("c_vec"),
            F.col("q_vec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", l2.alias("l2sq"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2sq"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def refine_topk(
    corpus: DataFrame,
    shortlist: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-rank of an ANN shortlist — the FAISS ``IndexRefineFlat``
    recipe: a cheap approximate search (ADC / LSH) over-fetches a shortlist
    of candidate ids, and the ORIGINAL vectors are consulted only for those
    candidates to compute exact squared-L2 and keep the true top-``k``.
    Recall then depends only on whether the true neighbor made the
    shortlist, not on where quantization mis-ranked it inside the list.

    ``shortlist``: (query_id, neighbor_id) — any ANN operator's output.
    Output: (query_id, neighbor_id, l2_micros, rank), ranked by exact
    distance with the (l2_micros asc, neighbor_id asc) integer tiebreak.

    Scale shape: the shortlist is |queries| x k' rows — broadcast it into
    ONE corpus scan (a broadcast join on id prunes the scan to candidate
    rows; no all-pairs product, no corpus shuffle); the query vectors join
    in as a second broadcast. Exactly one window over |queries| x k' rows
    ranks the result. The squared-L2 is the same fixed-order zip_with fold
    as l2_topk, snapped to integer micros — bit-replayable in the oracle."""
    cand = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    l2 = F.aggregate(
        F.zip_with(
            F.col("c_vec"),
            F.col("q_vec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.join(q, "query_id").select(
        "query_id",
        "neighbor_id",
        F.floor(l2 * F.lit(1_000_000.0) + F.lit(0.5)).cast("long").alias("l2_micros"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("l2_micros"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k on the Arrow/numpy fast path: the query
    matrix rides to every partition inside the closure, each Arrow batch of
    corpus vectors becomes one numpy GEMM, and only per-batch top-k rows
    leave Python. ~10-100× the FLOP rate of the fold-based exact path at
    high dims, at the cost of numpy's pairwise-summation float results
    (ULP-level differences — fine for retrieval, not for the bit-exact
    oracle gate; use cosine_topk there).

    Scale: no shuffle of the corpus; the final exact top-k merge ranks
    |queries|×k×|partitions| candidate rows — negligible.

    Zero-norm divergence from cosine_topk: the exact path emits such
    neighbors with null cosine (ranked last); this path drops them."""
    import numpy as np
    import pandas as pd

    corpus = floor_parallelism(corpus)

    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    q_ids = np.array([r.qid for r in q_rows])
    Q = np.array([r.qv for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def run(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            C = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(C, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                Cn = np.where(norms > 0, C / norms, 0.0)
            sims = Cn @ Qn.T  # |batch| × |queries|
            rows = []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                # drop self and zero-norm rows (exact path gives them null
                # cosine sorted last; NaN here would sort FIRST under desc)
                mask = (ids != qid) & (norms[:, 0] > 0) & ~np.isnan(col)
                cand_idx = np.nonzero(mask)[0]
                # per-batch truncation must tie-break like the final window
                # (cosine desc, neighbor_id asc) or ties at the k-boundary
                # get dropped by batch position
                order = np.lexsort((ids[cand_idx], -col[cand_idx]))
                take = cand_idx[order][:k]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qid, "neighbor_id": ids[take], "cosine": col[take]}
                    )
                )
            if rows:
                yield pd.concat(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(run, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = TOPK_PLANES,
    bands: int = TOPK_BANDS,
    n_probe_flips: int = 0,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: candidates are corpus rows
    sharing ≥1 sign-bit band with the query; exact cosine re-ranks candidates.

    The scale path: the corpus is hashed once (narrow projection), candidate
    generation is an equality join on (band, sig) against the broadcast query
    signatures, and the exact cosine runs only on the candidate set.

    Defaults are the RETRIEVAL-tuned family (TOPK_PLANES/TOPK_BANDS = 64/16,
    4-bit bands: recall@10 0.915 vs 0.076 at the near-dup family's 8-bit
    bands — measured in tools/ann_recall.py, frontier in PLANS.md §ANN
    recall). Band width is the quality/candidate-fraction knob: widen bands
    (more bits) as the target similarity rises.

    ``n_probe_flips > 0`` enables MULTI-PROBE querying (Lv et al. 2007,
    probe_band_signatures): each query band additionally probes the buckets
    reached by flipping its n weakest sign bits — recall that would
    otherwise need more bands (more corpus-side hash rows and index bytes)
    comes from extra QUERY-side probes instead; the corpus hash pass is
    byte-identical to the plain one. Measured at sf0.1 (50 queries): 32/8
    plain 0.728 → 0.906/0.97/0.99 recall@10 at 1/2/3 flips — two flips
    BEAT the 64/16 family's 0.926 with HALF the stored band rows
    (tools/ann_recall.py frontier)."""
    corpus = floor_parallelism(corpus)
    planes = hyperplane_signs(num_planes, dim)

    def with_bands(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        # signatures are built from the ORIGINAL column: referencing the alias
        # minted in the same select is a lateral-column-alias ref, which Spark
        # rejects under generators (explode)
        sigs = band_signatures(vec_col, planes, bands)
        pairs = F.array(
            *[F.struct(F.lit(b).alias("band"), s.alias("sig")) for b, s in enumerate(sigs)]
        )
        return (
            df.select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).alias(vec_alias),
                F.explode(pairs).alias("bs"),
            )
            .select(id_alias, vec_alias, "bs.band", "bs.sig")
        )

    def with_probe_bands(df: DataFrame, id_alias: str) -> DataFrame:
        arrays = probe_band_signatures(vec_col, planes, bands, n_probe_flips)

        # single-arg lambda via a factory: a two-arg lambda would be
        # interpreted as transform's (element, INDEX) form, silently
        # rebinding the band label to the element's position in the array
        def tag(b: int):
            return lambda s: F.struct(F.lit(b).alias("band"), s.alias("sig"))

        entries = F.flatten(
            F.array(*[F.transform(arr, tag(b)) for b, arr in enumerate(arrays)])
        )
        return (
            df.select(F.col(id_col).alias(id_alias), F.explode(entries).alias("bs"))
            .select(id_alias, "bs.band", "bs.sig")
        )

    # Candidate generation runs on BARE IDS: the 64-double vectors would
    # otherwise ride the band explode (|corpus| x bands rows), the band join,
    # and the dedup exchange. Generating (query_id, neighbor_id) pairs first
    # and re-attaching vectors afterwards moves the vector payloads off every
    # wide step — the candidate set is broadcast back against the corpus, so
    # the corpus is scanned exactly twice (hash pass + fetch pass) with no
    # corpus-wide shuffle at all. A/B at sf0.1: 5.8s -> 2.3s, identical rows.
    qb = F.broadcast(
        with_probe_bands(queries, "query_id")
        if n_probe_flips > 0
        else with_bands(queries, "query_id", "q_vec").select(
            "query_id", "band", "sig"
        )
    )
    cb = with_bands(corpus, "neighbor_id", "c_vec").select("neighbor_id", "band", "sig")
    cand_ids = (
        cb.join(qb, ["band", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cand = (
        F.broadcast(cand_ids)
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
                )
            ),
            "query_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_planes_for(
    threshold: float,
    min_recall: float = 0.9,
    max_fp_weight: float = 0.2,
    max_planes: int = 256,
) -> tuple[int, int]:
    """Pick (num_planes, bands) from the sign-LSH S-curve for a COSINE
    threshold — the hyperplane sibling of dedup.lsh_params_for (VERDICT r7
    #2, completed for the embedding family in r8).

    Sign-LSH bit-agreement probability for a pair at angle θ is
    p = 1 − θ/π (Goemans-Williamson / Charikar 2002), so a pair at
    ``cosine = threshold`` collides in one r-bit band with probability p^r
    and becomes a candidate with probability 1 − (1 − p^r)^bands. Returns
    the cheapest family (fewest total planes; ties → more bits per band =
    fewer false positives) with candidate probability ≥ ``min_recall`` AT
    the threshold while the junk mass at cosine 0 (uncorrelated
    embeddings, p = 1/2 — the bulk of any real corpus) stays ≤
    ``max_fp_weight``.

    The engine's planes are seeded ±1 (Rademacher) rather than Gaussian;
    at the dimensions embeddings live in, the agreement probability
    matches 1 − θ/π to within ~0.01/bit (CLT; the r7 frontier measured the
    per-bit agreement at exactly this value on the 64-dim corpus), so the
    analytic curve is the calibration — pinned against a planted cosine
    grid in tests/test_similarity.py."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if not 0.0 < min_recall < 1.0:
        raise ValueError(f"min_recall must be in (0, 1), got {min_recall}")
    p = 1.0 - math.acos(threshold) / math.pi
    best: tuple[int, int, int] | None = None  # (total, -bits, bands)
    for bits in range(1, 25):
        pr = p**bits
        if pr >= 1.0:
            continue
        bands = math.ceil(math.log(1.0 - min_recall) / math.log(1.0 - pr))
        if bands < 1 or bits * bands > max_planes:
            continue
        fp = 1.0 - (1.0 - 0.5**bits) ** bands
        if fp > max_fp_weight:
            continue
        cand = (bits * bands, -bits, bands)
        if best is None or cand < best:
            best = cand
    if best is None:
        raise ValueError(
            f"no sign-LSH family with <= {max_planes} planes reaches recall "
            f"{min_recall} at cosine {threshold} with false-positive weight "
            f"<= {max_fp_weight} at cosine 0"
        )
    total, _neg_bits, bands = best
    return total, bands


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = DEFAULT_PLANES,
    bands: int = DEFAULT_BANDS,
    plan_bands: bool = False,
    n_probe_flips: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-blocked candidate pairs
    (sharing ≥1 band), exact cosine ≥ threshold. Output (id_a, id_b, cosine),
    id_a < id_b.

    Same blocking trade-off as MinHash-LSH in operators/dedup.py: recall is
    bounded by the band structure, which is exactly what the paired oracle
    replays — the quadratic all-pairs join never runs.

    Candidate generation runs on BARE IDS (the lsh_topk shape, A/B'd there
    at 5.8s → 2.3s): only (id, band, sig) triples ride the band explode, the
    band self-join, and the pair-dedup exchange; the 64-double vectors and
    norms re-attach to the deduped candidate pairs afterwards via two narrow
    id-equality joins (AQE broadcasts the candidate side when it is small;
    at warehouse scale they are plain shuffle joins — candidate pairs grow
    with the corpus, so broadcasting them is deliberately NOT hinted).

    ``plan_bands=True`` derives (num_planes, bands) from the cosine
    ``threshold`` itself via lsh_planes_for (candidate probability ≥ 0.9
    for pairs AT the threshold, junk mass at cosine 0 bounded) instead of
    the raw knobs; the exact-cosine verify is unchanged either way, so the
    planned path changes only which true pairs the band join can surface.

    ``n_probe_flips > 0`` applies MULTI-PROBE to the self-join (round 10,
    the lsh_topk lever brought to the dedup shape): the PROBE side of the
    band join additionally explodes the buckets reached by flipping each
    band's n weakest sign bits (probe_band_signatures), while the INDEX
    side stays the plain banding — stored band rows are unchanged; recall
    comes from extra probe-side rows. Since every row probes, a pair is
    caught when either member's probe reaches the other's bucket; pairs
    are normalized to id_a < id_b after the (now asymmetric) join."""
    if plan_bands:
        if (num_planes, bands) != (DEFAULT_PLANES, DEFAULT_BANDS):
            raise ValueError(
                "pass either plan_bands=True (band structure derived from "
                "threshold) or raw num_planes/bands knobs, not both"
            )
        num_planes, bands = lsh_planes_for(threshold)
    df = floor_parallelism(df)
    planes = hyperplane_signs(num_planes, dim)
    if n_probe_flips > 0:
        # ONE plane-dot pass for BOTH join sides (round 13): the probe
        # arrays carry the plain base signature as their FIRST element
        # (probe_band_signatures' contract), so the corpus/index side is a
        # filter over the same exploded rows instead of its own
        # band_signatures pass — the r12 shape ran the 45-plane dot kernel
        # twice over the corpus and checkpointed it twice. `is_base` tags
        # the array position; values are bit-identical by construction.
        arrays = probe_band_signatures(vec_col, planes, bands, n_probe_flips)

        def tag(b: int):
            # two-arg lambda IS transform's (element, index) form — the
            # index is exactly the base/flip discriminator here
            return lambda s, i: F.struct(
                F.lit(b).alias("band"), s.alias("sig"), (i == 0).alias("is_base")
            )

        entries = F.flatten(
            F.array(*[F.transform(arr, tag(b)) for b, arr in enumerate(arrays)])
        )
        probe_ids = (
            df.select(F.col(id_col).alias("id"), F.explode(entries).alias("bs"))
            .select("id", "bs.band", "bs.sig", "bs.is_base")
            .localCheckpoint(eager=False)
        )
        cand = (
            probe_ids.select(F.col("id").alias("id_a"), "band", "sig")
            .join(
                probe_ids.filter(F.col("is_base")).select(
                    F.col("id").alias("id_b"), "band", "sig"
                ),
                ["band", "sig"],
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        sigs = band_signatures(vec_col, planes, bands)
        pairs = F.array(
            *[
                F.struct(F.lit(b).alias("band"), s.alias("sig"))
                for b, s in enumerate(sigs)
            ]
        )
        hashed_ids = (
            df.select(F.col(id_col).alias("id"), F.explode(pairs).alias("bs"))
            .select("id", "bs.band", "bs.sig")
            # both self-join sides read this frame; a LAZY local checkpoint
            # materializes the 32-plane-dot hash pass once at first action
            # and is freed by the context cleaner when the frame becomes
            # unreachable — the r2 version cache()d (and never unpersisted)
            # the frame WITH vectors and norms aboard
            .localCheckpoint(eager=False)
        )
        cand = (
            hashed_ids.select(F.col("id").alias("id_a"), "band", "sig")
            .join(
                hashed_ids.select(F.col("id").alias("id_b"), "band", "sig"),
                ["band", "sig"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
    # norm is precomputed per ROW, not per candidate pair — the value is
    # bit-identical (same fold, same sqrt), it just runs |corpus| times
    # instead of |candidates| times. The lazy checkpoint matters: BOTH
    # re-attach joins consume this frame, and without it each join re-scans
    # the source (and re-runs whatever built it — the gate's mutated-copy
    # transform runs over every 64-float array per consumer). Interleaved
    # A/B at sf0.1 (round 4, fresh-cache runs): uncheckpointed 9.7/9.9 s
    # cold · 3.4-4.1 s warm vs checkpointed 4.1 s cold · 3.2-3.5 s warm —
    # this was the real cause of the r2→r3 bench drift (4.88→5.87 s), not
    # the bare-ids band join itself, which stays (narrow rows through the
    # band exchange is the 100 TB shape).
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("norm"),
    ).localCheckpoint(eager=False)
    scored = cand.join(
        vecs.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("vec_a"),
            F.col("norm").alias("norm_a"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("vec_b"),
            F.col("norm").alias("norm_b"),
        ),
        "id_b",
    )
    # (Round-12 note: swapping this per-pair fold for the unrolled
    # _dot_chain_sql — the semantic_dedup trick — was measured 2x SLOWER
    # here (interleaved A/B, exec 4.3 s → 8.6 s): in this join shape the
    # 64 element_at terms do not fuse into one tight codegen loop the way
    # semantic_dedup's projection does. The fold stays.)
    cos = cosine_prenormed(
        F.col("vec_a"), F.col("vec_b"), F.col("norm_a"), F.col("norm_b")
    )
    return (
        scored.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    bench_id_col: str = "bench_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = DEFAULT_PLANES,
    bands: int = DEFAULT_BANDS,
    plan_bands: bool = False,
) -> DataFrame:
    """Semantic (embedding-level) benchmark decontamination — the embedding
    sibling of corpus.contamination_stats' 5-gram overlap: flag every corpus
    vector whose cosine to SOME benchmark vector reaches ``threshold``, with
    the strongest match as evidence. Paraphrased or re-tokenized test items
    that n-gram overlap misses still land next to their source in embedding
    space (the Phi/Llama decontamination recipe).

    Output: (id, bench_id, cosine) — one row per CONTAMINATED corpus id,
    carrying its best benchmark match (max cosine, ties to the smaller
    bench id). Clean corpus rows don't appear; downstream drops flagged ids
    with one anti-join.

    Scale shape (the asymmetric two-table variant of
    embedding_near_dup_pairs): the benchmark side is small by definition
    (test sets are thousands of rows vs the 100 TB corpus), so its band
    rows AND its vectors are broadcast — candidate generation is one
    corpus scan producing bare (id, band, sig) triples joined against the
    broadcast bench band table, and the exact-cosine verify re-attaches
    corpus vectors via one narrow id join. The corpus is never shuffled by
    value; the only wide exchange carries candidate (id, bench_id) pairs.
    Recall is bounded by the band structure exactly as the oracle replays
    it; every floating step is the shared fold/LCG contract.

    ``plan_bands=True`` derives (num_planes, bands) from the cosine
    ``threshold`` via lsh_planes_for (the r8 measured-threshold contract,
    same rule as embedding_near_dup_pairs) instead of the raw knobs."""
    if plan_bands:
        if (num_planes, bands) != (DEFAULT_PLANES, DEFAULT_BANDS):
            raise ValueError(
                "pass either plan_bands=True (band structure derived from "
                "threshold) or raw num_planes/bands knobs, not both"
            )
        num_planes, bands = lsh_planes_for(threshold)
    corpus = floor_parallelism(corpus)
    planes = hyperplane_signs(num_planes, dim)

    def band_rows(df: DataFrame, out_id: str, in_id: str) -> DataFrame:
        sigs = band_signatures(vec_col, planes, bands)
        pairs = F.array(
            *[
                F.struct(F.lit(b).alias("band"), s.alias("sig"))
                for b, s in enumerate(sigs)
            ]
        )
        return df.select(
            F.col(in_id).alias(out_id), F.explode(pairs).alias("bs")
        ).select(out_id, "bs.band", "bs.sig")

    cand = (
        band_rows(corpus, "id", id_col)
        .join(F.broadcast(band_rows(bench, "bench_id", bench_id_col)), ["band", "sig"])
        .select("id", "bench_id")
        .dropDuplicates(["id", "bench_id"])
    )
    cvecs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("c_norm"),
    )
    bvecs = F.broadcast(
        bench.select(
            F.col(bench_id_col).alias("bench_id"),
            F.col(vec_col).alias("b_vec"),
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("b_norm"),
        )
    )
    cos = cosine_prenormed(
        F.col("c_vec"), F.col("b_vec"), F.col("c_norm"), F.col("b_norm")
    )
    scored = (
        cand.join(cvecs, "id")
        .join(bvecs, "bench_id")
        .select("id", "bench_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("id").orderBy(F.col("cosine").desc(), F.col("bench_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "bench_id", "cosine")
    )


SNAP = 1 << 20  # fixed-point scale for k-means dimension means (exact sums)


def train_centroids_kmeans(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd k-means for the IVF coarse quantizer.

    Every step is order-free and engine-replayable (the paired DuckDB oracle
    unrolls the identical iterations):
    - init: the n_centroids lowest-id corpus vectors (cast to double);
    - assignment: argmax cosine, ties to the smallest centroid id — the same
      struct-max rule as ivf_topk;
    - update: per-dimension mean via INTEGER-snapped sums
      (floor(x * 2^20 + 0.5) summed exactly, then (double)sum / count / 2^20
      — cross-row float addition order can never matter);
    - empty clusters keep their previous centroid.

    Scale shape: each iteration is one distributed job — broadcast-array
    assignment (no shuffle) + posexplode/groupBy on (cent_id, dim)
    (n_centroids x dim grouped rows) — then an n_centroids x dim collect;
    centroids are driver-tiny by definition. Returns [(cent_id, vec_double)]
    suitable for ivf_topk(centroids=...)."""
    spark = corpus.sparkSession
    init = (
        corpus.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .orderBy("cent_id")
        .limit(n_centroids)
        .collect()
    )
    cents: list[tuple[int, list[float]]] = [
        (int(r.cent_id), [float(x) for x in r.cent_vec]) for r in init
    ]
    base = (
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("_vnorm", F.sqrt(dot(F.col("vec"), F.col("vec"))))
        .cache()  # every iteration re-scans this frame; cache beats
        # re-reading parquet + re-computing norms per iteration (A/B at
        # sf0.1, full ivf_kmeans gate: 5.5s -> 4.8s; unpersisted on return)
    )
    def _py_norm(vec: list[float]) -> float:
        # the engine fold bit-for-bit: sequential left fold of double
        # products, then IEEE sqrt — Python float ops ARE IEEE doubles, so
        # this equals sqrt(dot(v, v)) engine-side (the ivf_topk literal-path
        # argument)
        import math

        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        return math.sqrt(acc)

    for _ in range(n_iters):
        # one_row as a pure LITERAL select (round 12): the per-iteration
        # createDataFrame + collect_list aggregate built the identical
        # VALUE (an array of (cent_id, cent_vec, cent_norm) structs; the
        # consumer array_max is order-free) but cost a createDataFrame
        # round trip and one broadcast-side aggregate job per iteration.
        cents_sql = "array(" + ", ".join(
            f"named_struct('cent_id', {cid}L, 'cent_vec', array("
            + ",".join(f"{float(x)!r}D" for x in vec)
            + f"), 'cent_norm', {_py_norm(vec)!r}D)"
            for cid, vec in cents
        ) + ")"
        one_row = F.broadcast(
            spark.range(1).select(F.expr(cents_sql).alias("_cents"))
        )
        mapped = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cosine_prenormed(
                    F.col("vec"), c["cent_vec"], F.col("_vnorm"), c["cent_norm"]
                ).alias("cos"),
                (-c["cent_id"]).cast("int").alias("negid"),
            ),
        )
        assigned = base.crossJoin(one_row).select(
            "vec", (-F.array_max(mapped).getField("negid")).cast("long").alias("cent_id")
        )
        stats = (
            assigned.select("cent_id", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cent_id", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("val").cast("double") * SNAP + F.lit(0.5)).cast("long")
                ).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        by_cent: dict[int, dict[int, float]] = {}
        for r in stats:
            # (double)sum / count / 2^20 — the exact op order the oracle replays
            by_cent.setdefault(int(r.cent_id), {})[int(r.pos)] = (
                float(r.s) / int(r.c) / float(SNAP)
            )
        cents = [
            (
                cid,
                [d[p] for p in sorted(d)] if (d := by_cent.get(cid)) else old,
            )
            for cid, old in cents
        ]
    base.unpersist()
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    assign_via: str = "auto",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the clustered scale path next
    to the hyperplane-LSH one.

    Coarse quantizer: the `n_centroids` lowest-id corpus vectors serve as
    centroids (deterministic sampling instead of iterative k-means training —
    the partitioning quality is data-dependent but the mechanics, and the
    oracle replay, are exact). Every corpus vector is assigned to its highest
    -cosine centroid; a query probes its `n_probe` nearest centroids and
    exact-cosine re-ranks ONLY those inverted lists.

    Scale shape: assignment is shuffle-free either way, via `assign_via`:
    - "literal": each centroid inlined as a literal array; per-row argmax is
      greatest-over-structs, fully codegen'd. Plan size O(n_centroids × dim)
      — right for toy quantizers (≤ ~64 centroids).
    - "broadcast": the centroid set stays a DataFrame, collapsed to ONE row
      holding an array<struct{cent_id, cent_vec, cent_norm}> and broadcast-
      cross-joined onto every row; argmax is array_max over a transform()
      lambda. Plan size O(1), centroids travel as broadcast data — the only
      form that survives a realistic 4k-centroid quantizer. (transform() is
      interpreted, not codegen'd — the literal path stays default for small
      quantizers.)
    Both paths share the struct tie rule (cosine desc, then smallest centroid
    id — same as the oracle's row_number) and the same fold-ordered cosine,
    so results are bit-identical; tests pin literal ≡ broadcast. The search
    then touches ~n_probe/n_centroids of the corpus. Recall is bounded by
    probe coverage, exactly what the paired oracle replays.

    NO parallelism floor here: inserting a round-robin exchange under the
    literal assignment chain moves the 16×64-term codegen unit across a
    stage boundary and drops it to interpreted eval (measured 3.6 s → 24 s
    at sf0.1, single task either way) — and ivf's cost is the probe join,
    not the scan-side kernel."""
    import math

    if centroids is not None:
        n_centroids = len(centroids)
    if assign_via == "auto":
        assign_via = "literal" if n_centroids <= 64 else "broadcast"
    if assign_via not in ("literal", "broadcast"):
        raise ValueError(f"assign_via must be literal|broadcast|auto, got {assign_via!r}")

    if centroids is not None:
        # pre-trained quantizer (train_centroids_kmeans) — double vectors
        cent_df = corpus.sparkSession.createDataFrame(
            centroids, "cent_id long, cent_vec array<double>"
        )
    else:
        cent_df = (
            corpus.select(
                F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec")
            )
            .orderBy("cent_id")
            .limit(n_centroids)
        )

    if assign_via == "literal":
        cent_rows = cent_df.collect()

        def _py_norm(vec) -> float:
            # the engine fold bit-for-bit: sequential left fold of exact
            # float32→double products, then IEEE sqrt — Python float ops ARE
            # IEEE doubles, so this equals sqrt(dot(v, v)) in either engine
            acc = 0.0
            for x in vec:
                acc += float(x) * float(x)
            return math.sqrt(acc)

    def _literal_structs_arr(vec_alias: str, vnorm_alias: str) -> Column:
        """array<(cosine-to-centroid, -cent_id)>: max ⇒ best centroid with
        the smallest id on ties. The row's norm is read from a precomputed
        column and each centroid's norm is a Python-computed literal — both
        bit-identical to inline sqrt(dot()), evaluated once instead of once
        per centroid. SERVER-PARSED as one F.expr (round 12, the
        band_signatures lesson): the Column form cost ~70 py4j round trips
        per centroid per assignment side; the parsed zip_with/aggregate
        fold is node-identical, values bit-equal (oracle + pytest pinned)."""
        structs = []
        for r in cent_rows:
            arr = "array(" + ",".join(f"{float(x)!r}D" for x in r.cent_vec) + ")"
            dot_s = (
                f"aggregate(zip_with(`{vec_alias}`, {arr}, "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"0.0D, (acc, x) -> acc + x)"
            )
            structs.append(
                f"named_struct('cos', ({dot_s}) / "
                f"nullif(`{vnorm_alias}` * {_py_norm(r.cent_vec)!r}D, 0.0D), "
                f"'negid', {-int(r.cent_id)})"
            )
        return F.expr("array(" + ", ".join(structs) + ")")

    def _pick(base: DataFrame, id_alias: str, vec_alias: str, keep: int,
              structs_arr: Column) -> DataFrame:
        """Shared argmax/top-keep over an array<struct{cos, negid}> column."""
        if keep == 1:
            best = F.array_max(structs_arr)
            return base.select(
                id_alias, vec_alias, (-best.getField("negid")).alias("cent_id")
            )
        ranked = F.slice(F.reverse(F.array_sort(structs_arr)), 1, keep)
        return base.select(
            id_alias, vec_alias, F.explode(ranked).alias("bs")
        ).select(id_alias, vec_alias, (-F.col("bs.negid")).alias("cent_id"))

    def assign(df: DataFrame, id_alias: str, vec_alias: str, keep: int) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
        ).withColumn(
            "_vnorm", F.sqrt(dot(F.col(vec_alias), F.col(vec_alias)))
        )
        if assign_via == "literal":
            return _pick(
                base, id_alias, vec_alias, keep, _literal_structs_arr(vec_alias, "_vnorm")
            )
        # broadcast path: one row carrying all centroids as an array column;
        # norms computed engine-side with the same fold → bit-identical
        cents_one_row = F.broadcast(
            cent_df.withColumn(
                "cent_norm", F.sqrt(dot(F.col("cent_vec"), F.col("cent_vec")))
            ).agg(
                F.collect_list(
                    F.struct("cent_id", "cent_vec", "cent_norm")
                ).alias("_cents")
            )
        )
        mapped = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cosine_prenormed(
                    F.col(vec_alias), c["cent_vec"], F.col("_vnorm"), c["cent_norm"]
                ).alias("cos"),
                (-c["cent_id"]).cast("int").alias("negid"),
            ),
        )
        return _pick(base.crossJoin(cents_one_row), id_alias, vec_alias, keep, mapped)

    lists = assign(corpus, "neighbor_id", "c_vec", keep=1)
    probes = assign(queries, "query_id", "q_vec", keep=n_probe)
    cand = lists.join(probes, "cent_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            cosine(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _dot_chain_sql(x: str, y: str, dim: int) -> str:
    """Dot product as a server-parsed UNROLLED SQL chain — term-for-term the
    same left-associative IEEE sum the zip_with/aggregate fold (and a SQL
    oracle's list_reduce) performs, but whole-stage-codegen'd instead of
    interpreted per row."""
    return " + ".join(
        f"(CAST(element_at({x}, {i}) AS DOUBLE) * "
        f"CAST(element_at({y}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )


def _assign_clusters(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
    assign_via: str,
) -> DataFrame:
    """(id, v, cluster_id): nearest-centroid assignment — struct-min squared-L2
    argmin, ties to the smaller centroid id — shared by semantic_dedup and the
    incremental ingest twin so the two can never diverge on cluster routing."""
    from payroll_etl_fastapi_spark.operators.pq import _block_dist

    nlist = len(centroids)
    if assign_via == "auto":
        # literal→broadcast cutoff is TOTAL chain terms, not centroid count:
        # 16 centroids x 64 dims of unrolled literal chains already overflow
        # janino's 64 KB method limit when whole-stage codegen fuses the
        # self-join's two assignment sides — the failed compile ATTEMPT
        # alone cost ~50 s per run before falling back to interpreted eval.
        # The broadcast fold is bit-identical (pinned by test) with O(1)
        # generated code.
        #
        # broadcast→gemm cutoff (VERDICT r7 #6) is CENTROID count: the
        # fold interpreter pays O(k) lambda evaluations per row, the Arrow
        # GEMM pays one (batch x k) matmul — measured 14.8x at 800
        # centroids, and production SemDeDup k (LAION: 50k clusters) sits
        # far past it. GEMM reassociates float sums (near-tie routing may
        # differ from the fold at <1 ULP distance gaps), so ORACLE-REPLAYED
        # gates that must stay bit-exact at every scale pass
        # literal/broadcast explicitly — the fold-for-audit fallback.
        if nlist > GEMM_AUTO_CENTROIDS:
            assign_via = "gemm"
        elif nlist * len(centroids[0]) <= 512:
            assign_via = "literal"
        else:
            assign_via = "broadcast"
    if assign_via not in ("literal", "broadcast", "gemm"):
        raise ValueError(
            f"assign_via must be literal|broadcast|gemm|auto, got {assign_via!r}"
        )
    if assign_via == "gemm":
        return _assign_clusters_gemm(corpus, centroids, id_col, vec_col)
    corpus = floor_parallelism(corpus)
    vec = F.col(vec_col)
    if assign_via == "literal":
        # plan-size O(nlist x dim) codegen chains -- right for small
        # quantizers (the oracle-replayed gate shape)
        cells = F.array(
            *[
                F.struct(_block_dist(vec_col, 0, c).alias("d"), F.lit(i).alias("i"))
                for i, c in enumerate(centroids)
            ]
        )
        return corpus.select(
            F.col(id_col).alias("id"),
            vec.alias("v"),
            F.array_min(cells).getField("i").alias("cluster_id"),
        )
    # broadcast path (same trade as ivf_topk's): centroids travel as ONE
    # broadcast row, the argmin is array_min over a transform() lambda --
    # plan size O(1), the only form that survives SemDeDup's "raise k
    # with corpus size" rule (the 10x scale smoke went 7.3x super-linear
    # on 160 literal centroids before this path existed). The fold-based
    # L2 starts at 0.0 + d1, bit-identical to the literal chain (IEEE
    # 0.0 + x == x for the non-negative squared terms); pinned by test.
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cent_id long, cent_vec array<double>",
    )
    one_row = F.broadcast(
        cent_df.agg(
            F.collect_list(F.struct("cent_id", "cent_vec")).alias("_cents")
        )
    )
    mapped = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    c["cent_vec"],
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            c["cent_id"].cast("int").alias("i"),
        ),
    )
    return corpus.crossJoin(one_row).select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        F.array_min(mapped).getField("i").alias("cluster_id"),
    )


def _assign_clusters_gemm(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(id, v, cluster_id) via Arrow-batched numpy GEMM — the PRODUCTION
    assignment for large quantizers: per Arrow batch, argmin over
    ||v||² − 2·V·Cᵀ + ||c||² computed as ONE (batch × k) matmul instead of
    k interpreted fold evaluations per row. Measured 14.8× over the
    broadcast-fold path at the sf1 scaled-k shape (40k vectors × 800
    centroids: 15.6 s → 1.05 s, zero routing disagreements on the full
    corpus; PLANS.md §gemm assignment); the gap widens with k, which is
    exactly the regime SemDeDup's raise-k-with-n rule lives in.

    NOT used by the oracle-paired gates: BLAS reassociates the sums, so a
    vector whose two nearest centroids are within float-rounding of each
    other can route differently than the fold path (ties at EXACTLY equal
    distance break identically — np.argmin takes the first = smallest
    centroid id). tests pin full agreement with the broadcast path on the
    gate-shaped corpora, where no near-ties exist. The ||v||² term is
    dropped: constant per row, argmin-invariant."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)  # k × d, broadcast in closure
    cn = (C * C).sum(axis=1)  # ||c||² per centroid
    vec_type = corpus.schema[vec_col].dataType.simpleString()
    # derive the id field's type from the input schema like vec_type — a
    # hardcoded `id long` worked on bigint ids but silently coerced (or
    # broke) any other id type ONLY on this path (ADVICE r7)
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"id {id_type}, v {vec_type}, cluster_id int"

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array([np.asarray(r, dtype=np.float64) for r in pdf[vec_col]])
            d = V @ (-2.0 * C.T)
            d += cn[None, :]
            cid = np.argmin(d, axis=1).astype("int32")
            yield pd.DataFrame(
                {"id": pdf[id_col].values, "v": pdf[vec_col].values, "cluster_id": cid}
            )

    return corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(_assign, schema)


def incremental_semantic_dedup(
    index,
    batch: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
) -> DataFrame:
    """Dedupe a NEW embedding batch against a persisted cluster-routed vector
    index WITHOUT recomputing the corpus side, admit the survivors, and grow
    the index append-only — the SemDeDup ingest shape (the embedding sibling
    of operators.dedup.incremental_minhash_dedup): the quantizer is FROZEN
    after the first snapshot (as production SemDeDup ingest freezes it), new
    vectors route to their cluster, and comparisons stay cluster-local.

    ``index`` is a sources.txtable.TxTable holding (cluster_id, id, v, norm)
    for every previously ACCEPTED vector (created on first use). A batch
    vector is REJECTED iff it has a same-cluster match with cosine ≥
    ``threshold`` against (a) an index vector or (b) a lower-id vector of the
    same batch — the same greedy keep-first approximation the MinHash twin
    uses (a lower-id batch match rejects regardless of that vector's own
    fate; on dup-free snapshots this equals from-scratch keep-first).

    Returns one decision row per batch vector:
        (id, cluster_id, accepted, matched_id, cosine)
    with matched_id/cosine describing the SMALLEST-id verified match (NULL
    for accepted). Re-ingesting the same batch admits zero vectors (every
    vector self-matches at cosine ≈ 1); append-only growth and idempotence
    are pytest-pinned.

    Scale shape: batch cost only. Assignment and norms are linear in the
    batch; the index side is ONE equality join on cluster_id with the BATCH
    side broadcast — the 100 TB index never shuffles, and rows written per
    snapshot are exactly the accepted vectors. Cross-cluster near-dups are
    missed BY DESIGN (SemDeDup's own recall trade, replayed by the oracle)."""
    decisions, accepted_rows = incremental_semantic_decisions(
        index.snapshot() if index.exists() else None,
        batch,
        centroids,
        threshold,
        id_col,
        vec_col,
        assign_via,
    )
    index.append(accepted_rows)
    return decisions


def incremental_semantic_decisions(
    index_rows: DataFrame | None,
    batch: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
) -> tuple[DataFrame, DataFrame]:
    """Side-effect-free core of `incremental_semantic_dedup`: given the
    persisted index rows (or None for a fresh index), returns
    (decisions, accepted_rows) without writing anything — the same split as
    incremental_minhash_decisions, so a streaming ingest loop can wrap the
    corpus and index commits in their own exactly-once epoch guards."""
    dim = len(centroids[0])
    assigned = _assign_clusters(batch, centroids, id_col, vec_col, assign_via)
    # (id, v, cluster_id, norm) materialized ONCE — feeds the index join, the
    # in-batch self-join, the verdict join, and the accepted-rows projection
    normed = assigned.withColumn(
        "norm", F.expr(f"sqrt({_dot_chain_sql('v', 'v', dim)})")
    ).localCheckpoint(eager=False)
    probe = normed.select(
        F.col("id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "cluster_id",
    )
    # Zero-norm carve-out (ADVICE r6): nullif alone makes cosine NULL for a
    # zero-norm vector, so an all-zero embedding matches NOTHING — including
    # its own identical copy in the index — and re-ingest idempotence fails
    # for it (it re-admits every time). Identical zero vectors are exact
    # duplicates, so they short-circuit to cosine 1; a zero vector vs a
    # DIFFERENT vector stays NULL (direction undefined → no match). The
    # norms are non-negative, so na*nb = 0 iff either vector is zero-norm,
    # and va = vb under na*nb = 0 implies both are. The oracle replays the
    # same CASE (suite_similarity._sql_cosine_zeronorm).
    cos_sql = (
        f"CASE WHEN na * nb = 0.0D THEN "
        f"(CASE WHEN va = vb THEN 1.0D ELSE CAST(NULL AS DOUBLE) END) "
        f"ELSE ({_dot_chain_sql('va', 'vb', dim)}) / (na * nb) END"
    )
    cos_ge = f"({cos_sql}) >= {float(threshold)!r}D"
    cos_val = F.expr(cos_sql)
    matches = []
    if index_rows is not None:
        # the index is the BIG side at scale: join it against the broadcast
        # batch so it never shuffles. Its scan width bounds the pair-scan
        # parallelism, so floor it — a young index is a handful of parquet
        # files (the sf1 validation caught this: 2 files → 2 tasks carrying
        # a 6.7M-pair chain scan, 185 s; floored: seconds), while a mature
        # 100 TB index has thousands of splits and the floor is a no-op
        index_rows = floor_parallelism(index_rows)
        idx = index_rows.select(
            "cluster_id",
            F.col("id").alias("matched_id"),
            F.col("v").alias("vb"),
            F.col("norm").alias("nb"),
        )
        matches.append(
            idx.join(F.broadcast(probe), "cluster_id")
            .filter(F.expr(cos_ge))
            .select("id", "matched_id", cos_val.alias("cosine"))
        )
    lo = normed.select(
        "cluster_id",
        F.col("id").alias("matched_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    matches.append(
        probe.join(F.broadcast(lo), "cluster_id")
        .filter(F.col("matched_id") < F.col("id"))
        .filter(F.expr(cos_ge))
        .select("id", "matched_id", cos_val.alias("cosine"))
    )
    all_matches = matches[0]
    for m in matches[1:]:
        all_matches = all_matches.unionByName(m)
    # lazy checkpoint, the minhash `best` rationale (round 11): `decisions`
    # and `accepted_rows` both derive from this frame and the streaming
    # loop's dual epoch-guarded commits act on them separately — without it
    # the cluster-local pair scans run once per commit
    best = (
        all_matches.groupBy("id")
        .agg(F.min(F.struct("matched_id", "cosine")).alias("b"))
        .select("id", F.col("b.matched_id").alias("matched_id"), F.col("b.cosine").alias("cosine"))
        .localCheckpoint(eager=False)
    )
    decisions = (
        normed.join(best, "id", "left")
        .select(
            "id",
            "cluster_id",
            F.col("matched_id").isNull().alias("accepted"),
            "matched_id",
            "cosine",
        )
    )
    accepted_rows = normed.join(best.select("id"), "id", "left_anti").select(
        "cluster_id", "id", "v", "norm"
    )
    return decisions, accepted_rows


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_via: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with a coarse quantizer, then
    compare pairs ONLY within a cluster and drop every vector that has a
    lower-id cluster-mate with cosine >= threshold (the keep-lowest-id
    representative rule). Returns (id, cluster_id, is_dropped[0/1]) for
    every corpus vector.

    Clustering is what makes semantic dedup tractable: the quadratic pair
    comparison runs per cluster, so with k clusters the work is
    sum(|cluster|^2) ≈ n^2/k instead of n^2 — at 100 TB you raise k until
    clusters fit the budget (SemDeDup used 50k clusters for LAION), and the
    shuffle is a plain hash partition on cluster_id. Cross-cluster
    near-dups are missed BY DESIGN — that recall trade is the published
    algorithm's, not an implementation shortcut.

    Determinism: assignment is the same literal-centroid struct-min L2
    argmin as operators.pq (ties -> smaller cluster id); the in-cluster
    cosine is the shared fold-ordered bit-exact cosine, so a SQL oracle
    replays assignment, pairing, and verdicts exactly.

    Zero-norm carve-out: here cosine is NULL for a zero-norm vector, so
    all-zero embeddings never match and are ALL KEPT — a documented
    batch-mode convention (the oracle encodes the same nullif). The
    incremental ingest twin (incremental_semantic_decisions) instead
    short-circuits identical zero vectors to cosine 1, because its
    re-ingest-idempotence contract requires an exact zero-vector copy to
    match itself."""
    assigned = _assign_clusters(corpus, centroids, id_col, vec_col, assign_via)
    # pairwise cosine as a server-parsed UNROLLED chain, not the zip_with/
    # aggregate fold: higher-order lambdas are interpreted per pair, and at
    # ~500k within-cluster pairs that read as ~2 min of eval at sf0.1; the
    # unrolled chain whole-stage-codegens and is term-for-term the same
    # left-associative IEEE sum the fold (and the SQL oracle's list_reduce)
    # performs, with per-row norms computed ONCE before the join
    dim = len(centroids[0])

    def _dot_sql(x: str, y: str) -> str:
        return _dot_chain_sql(x, y, dim)

    # materialize (id, v, cluster_id, norm) ONCE: the frame feeds the pair
    # join's probe side, its broadcast build side, AND the final verdict
    # join — without the checkpoint the (interpreted-lambda) assignment
    # re-evaluates per consumer, which at 64 broadcast centroids read as
    # ~30 s of the gate's wall time on 4k rows
    normed = assigned.withColumn(
        "_vn", F.expr(f"sqrt({_dot_sql('v', 'v')})")
    ).localCheckpoint(eager=False)
    # the probe side inherits the source's partitioning (often ONE file →
    # 1-2 partitions at gate scale), and the per-pair work all happens on
    # its tasks once the build side broadcasts — spread it across the
    # cluster width or a million-pair filter runs on 2 cores. The partition
    # count is EXPLICIT: the input is kilobytes but each row fans out to
    # thousands of pairs, so AQE's size-based coalescing would fold the
    # shuffle back to one task
    n_parts = corpus.sparkSession.sparkContext.defaultParallelism
    left = normed.repartition(n_parts, F.col("id")).select(
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("_vn").alias("na"),
        "cluster_id",
    )
    right = normed.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("_vn").alias("nb"),
        F.col("cluster_id").alias("cluster_b"),
    )
    # BROADCAST the build side: a plain shuffle join partitions by
    # cluster_id, and with k clusters there are at most k non-empty tasks —
    # one skewed cluster serializes its whole |c|²/2 pair scan (measured:
    # a 1546-row cluster put ~1.2M chain evals on one task, 80 s that no
    # core count could shrink). Broadcasting keeps the probe side's id-hash
    # partitioning, so a heavy cluster's pairs spread over every task. At
    # corpus sizes past broadcast reach, salt the cluster key
    # (operators/skew.py) or cap cluster sizes as SemDeDup itself does.
    dropped = (
        left.join(
            F.broadcast(right),
            (F.col("cluster_id") == F.col("cluster_b"))
            & (F.col("id_b") < F.col("id_a")),
        )
        .filter(
            F.expr(
                f"({_dot_sql('va', 'vb')}) / nullif(na * nb, 0.0D)"
                f" >= {float(threshold)!r}D"
            )
        )
        .select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        assigned.join(dropped, "id", "left")
        .select(
            "id",
            "cluster_id",
            F.coalesce(F.col("is_dropped"), F.lit(0)).alias("is_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# ANN planner (round 9, VERDICT r8 #1): route a caller's (target_recall,
# memory_budget) across the MEASURED retrieval frontier — the retrieval
# mirror of dedup.lsh_params_for. The engine holds nine committed recall
# points (tools/quality_baseline.json floors, asserted by
# tools/quality_assert.py; measured values in .ann_recall.json, sf0.1
# harness, r8); until now a caller had to read PLANS.md to learn "at
# recall 0.9 use multiprobe-32/8-f2 or SQ8, never bare ADC". ann_plan
# encodes that routing as data, ann_topk executes the pick.
# ---------------------------------------------------------------------------

# One row per committed frontier point. ``floor`` MUST mirror
# tools/quality_baseline.json ann_recall_floors (pinned by
# tests/test_similarity.py::test_ann_plan_floors_match_committed_baseline):
# the planner promises only what quality_assert enforces — measured values
# are reported for context and used solely as a tiebreak.
#
# Byte accounting at dimension d (parquet float32 raw vectors = 4d bytes):
#   stored(d) = bytes/vector the index keeps resident (including the raw
#               vectors when the family re-ranks or refines against them);
#   scan(d)   = bytes/vector a query batch actually reads — the 100 TB
#               cost axis (a 1000-executor scan is width x rows; probe-
#               bounded families multiply by n_probe/nlist).
# LSH band rows are ~20 B each (band int, sig long, id long); the refine
# tail's shortlist fetch is |q|*k' random reads, amortized to ~1 B/vec.
_BAND_ROW_BYTES = 20
_REFINE_FETCH_BYTES = 1.0

ANN_FRONTIER: tuple[dict, ...] = (
    {
        "family": "sq8",
        "config": "8bit per-dim",
        "params": {},
        "floor": 0.90,
        "measured_recall": 0.984,
        "measured_secs": 1.976,
        "metric": "l2",
        "stored": lambda d: float(d),
        "scan": lambda d: float(d),
    },
    {
        "family": "lsh_multiprobe",
        "config": "planes=32 bands=8 flips=2",
        "params": {"num_planes": 32, "bands": 8, "n_probe_flips": 2},
        "floor": 0.90,
        "dedup_floor": 0.97,
        "measured_recall": 0.974,
        "measured_secs": 2.628,
        "metric": "cosine",
        "stored": lambda d: 4.0 * d + 8 * _BAND_ROW_BYTES,
        "scan": lambda d: float(8 * _BAND_ROW_BYTES),
    },
    {
        "family": "lsh",
        "config": "planes=64 bands=16",
        "params": {"num_planes": 64, "bands": 16, "n_probe_flips": 0},
        "floor": 0.85,
        "dedup_floor": 0.94,
        "measured_recall": 0.915,
        "measured_secs": 2.422,
        "metric": "cosine",
        "stored": lambda d: 4.0 * d + 16 * _BAND_ROW_BYTES,
        "scan": lambda d: float(16 * _BAND_ROW_BYTES),
    },
    {
        "family": "ivf",
        "config": "nlist=16 nprobe=4",
        "params": {"n_centroids": 16, "n_probe": 4},
        "floor": 0.45,
        "dedup_floor": 0.55,
        "measured_recall": 0.558,
        "measured_secs": 4.488,
        "metric": "cosine",
        "stored": lambda d: 4.0 * d + 8,
        "scan": lambda d: 4.0 * d * 4 / 16,
    },
    {
        "family": "ivf_kmeans",
        "config": "nlist=8(t) nprobe=2",
        "params": {"n_centroids": 8, "n_iters": 2, "n_probe": 2},
        "floor": 0.38,
        "dedup_floor": 0.75,
        "measured_recall": 0.469,
        "measured_secs": 3.549,
        "metric": "cosine",
        "stored": lambda d: 4.0 * d + 8,
        "scan": lambda d: 4.0 * d * 2 / 8,
    },
    {
        "family": "ivf_pq_refined",
        "config": "nlist=8(t) RESID-trained nprobe=4 mult=4",
        "params": {"nlist": 8, "m": 8, "kc": 16, "n_probe": 4, "refine_mult": 4},
        "floor": 0.30,
        "measured_recall": 0.373,
        "measured_secs": 4.544,
        "metric": "l2",
        "stored": lambda d: 4.0 * d + 9,  # raw vectors retained for the refine tail
        "scan": lambda d: 9.0 * 4 / 8 + _REFINE_FETCH_BYTES,
    },
    {
        "family": "pq_adc",
        "config": "m=8 k=16 trained",
        "params": {"m": 8, "kc": 16},
        "floor": 0.12,
        "measured_recall": 0.167,
        "measured_secs": 2.552,
        "metric": "l2",
        "stored": lambda d: 8.0,
        "scan": lambda d: 8.0,
    },
    {
        "family": "ivf_pq",
        "config": "nlist=8(t) m=8 k=16 RESID-trained nprobe=4",
        "params": {"nlist": 8, "m": 8, "kc": 16, "n_probe": 4},
        "floor": 0.11,
        "measured_recall": 0.158,
        "measured_secs": 3.633,
        "metric": "l2",
        "stored": lambda d: 9.0,
        "scan": lambda d: 9.0 * 4 / 8,
    },
    {
        "family": "ivf_pq",
        "config": "nlist=8(t) m=8 k=16 RESID-trained nprobe=2",
        "params": {"nlist": 8, "m": 8, "kc": 16, "n_probe": 2},
        "floor": 0.09,
        "measured_recall": 0.137,
        "measured_secs": 3.488,
        "metric": "l2",
        "stored": lambda d: 9.0,
        "scan": lambda d: 9.0 * 2 / 8,
    },
)


def ann_plan(
    target_recall: float,
    memory_budget: float | None = None,
    dim: int = 64,
    metric: str | None = None,
    allow_exact: bool = False,
    shape: str = "retrieval",
) -> dict:
    """Pick the cheapest committed ANN config meeting ``target_recall`` —
    the retrieval mirror of ``dedup.lsh_params_for`` (VERDICT r8 #1).

    A config QUALIFIES when its committed recall floor (the value
    tools/quality_assert.py enforces, NOT the higher measured point) is
    >= target_recall, its resident index fits ``memory_budget`` bytes per
    corpus vector (None = unbounded; raw float32 vectors cost 4*dim), and
    it ranks by the requested ``metric`` ("cosine" for the LSH/IVF-flat
    families, "l2" for the quantizers; None = either). Among qualifiers
    the pick minimizes (scan bytes/vector, measured secs, family) — scan
    width is THE 100 TB cost axis; the harness seconds only break ties.

    ``shape`` selects WHICH committed floor qualifies a config (VERDICT
    r10 #4): "retrieval" (default) uses the recall@10 frontier
    (ann_recall_floors); "dedup" uses the measured PAIR-recall floors of
    each family's DEDUP dispatch (banded self-join / SemDeDup
    within-cluster — semantic_dedup_pair_floors, tools/semdedup_quality.py
    harness) and only the families stage_semantic_dedup can dispatch carry
    one. The two are different quantities — retrieval recall@10 on a
    clustered corpus vs planted-twin pair recall at the verify threshold —
    so a dedup caller's target_recall now binds to a floor measured in the
    dedup shape, never mapped across by argument.

    ``allow_exact=True`` adds the exact brute-force scan (recall 1.0,
    scan = 4*dim, all-pairs-guarded at execution) as a last resort;
    without it an unreachable target raises, naming the frontier's
    ceiling — impossible asks fail loudly, they never silently degrade.

    Returns a plan dict: family, config, params, floor, measured_recall,
    measured_secs, metric, stored_bytes_per_vec, scan_bytes_per_vec.
    Execute it with ``ann_topk``. Example picks (pinned in
    tests/test_similarity.py, the lsh_params_for (36,9)@0.7 precedent):
    0.9 -> sq8; 0.9 + metric=cosine -> multiprobe 32/8-f2; 0.3 ->
    ivf_pq_refined (refine-over-ADC, never bare ADC); 0.12 + 8 B budget
    -> pq_adc; 0.95 -> raises (or exact when allowed)."""
    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    if metric not in (None, "cosine", "l2"):
        raise ValueError(f"metric must be cosine|l2|None, got {metric!r}")
    if shape not in ("retrieval", "dedup"):
        raise ValueError(f"shape must be retrieval|dedup, got {shape!r}")
    floor_key = "dedup_floor" if shape == "dedup" else "floor"
    feasible = []
    for c in ANN_FRONTIER:
        floor = c.get(floor_key)
        if floor is None or floor < target_recall:
            continue
        if metric is not None and c["metric"] != metric:
            continue
        stored = c["stored"](dim)
        if memory_budget is not None and stored > memory_budget:
            continue
        feasible.append((c["scan"](dim), c["measured_secs"], c["family"], c))
    if not feasible:
        raw = 4.0 * dim
        if allow_exact and (memory_budget is None or raw <= memory_budget):
            return {
                "family": "exact",
                "config": "brute-force (all-pairs-guarded)",
                "params": {},
                "floor": 1.0,
                "shape": shape,
                "measured_recall": 1.0,
                "measured_secs": None,
                "metric": metric or "l2",
                "stored_bytes_per_vec": raw,
                "scan_bytes_per_vec": raw,
            }
        best_floor = max(
            (c.get(floor_key, 0.0) or 0.0 for c in ANN_FRONTIER
             if metric is None or c["metric"] == metric),
            default=0.0,
        )
        raise ValueError(
            f"no committed ANN config reaches {shape} recall {target_recall}"
            + (f" at metric {metric!r}" if metric else "")
            + (f" within {memory_budget} bytes/vector" if memory_budget is not None else "")
            + f"; the frontier's highest committed {shape} floor is {best_floor} "
            "(tools/quality_baseline.json). Pass allow_exact=True for the "
            "guarded brute-force scan, or relax the ask."
        )
    scan, secs, _fam, chosen = min(feasible, key=lambda t: (t[0], t[1], t[2]))
    return {
        "family": chosen["family"],
        "config": chosen["config"],
        "params": dict(chosen["params"]),
        "floor": chosen[floor_key],
        "shape": shape,
        "measured_recall": chosen["measured_recall"],
        "measured_secs": chosen["measured_secs"],
        "metric": chosen["metric"],
        "stored_bytes_per_vec": chosen["stored"](dim),
        "scan_bytes_per_vec": scan,
    }


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    target_recall: float,
    memory_budget: float | None = None,
    dim: int = 64,
    metric: str | None = None,
    allow_exact: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plan: dict | None = None,
) -> DataFrame:
    """Single recall-contract entry point for approximate nearest-neighbor
    search: plan with ``ann_plan`` (or accept a precomputed ``plan``), then
    train whatever the chosen family needs in-call (SQ8 bounds, k-means
    coarse quantizers, residual PQ codebooks — the same deterministic
    trainers the driver gates replay in SQL) and execute the search.

    Output is normalized to (query_id, neighbor_id, rank) — the family-
    specific score columns (cosine, adc_micros, d_micros, l2_micros) carry
    different semantics, so the routed surface exposes only the ranking;
    call the family operator directly for scores.

    Scale: every dispatched path is the documented probe-bounded /
    broadcast-table shape of its operator; training is driver-tiny
    (centroids, codebooks, bounds) by construction."""
    from payroll_etl_fastapi_spark.operators import pq as PQ

    p = plan or ann_plan(
        target_recall,
        memory_budget=memory_budget,
        dim=dim,
        metric=metric,
        allow_exact=allow_exact,
    )
    fam, prm = p["family"], p["params"]
    if fam == "sq8":
        bounds = PQ.sq8_train_bounds(corpus, dim, vec_col)
        # materialize the byte index before searching (the stored-index
        # contract): a lazy encode collapses under the query cross join and
        # re-evaluates per (row, query) pair — 6.6x at sf0.1
        packed = PQ.sq8_encode_packed(
            corpus, bounds, id_col, vec_col
        ).localCheckpoint()
        out = PQ.sq8_topk(packed, queries, bounds, k, id_col, vec_col)
    elif fam in ("lsh", "lsh_multiprobe"):
        out = lsh_topk(
            corpus,
            queries,
            k,
            id_col=id_col,
            vec_col=vec_col,
            dim=dim,
            num_planes=prm["num_planes"],
            bands=prm["bands"],
            n_probe_flips=prm["n_probe_flips"],
        )
    elif fam == "ivf":
        out = ivf_topk(
            corpus,
            queries,
            k,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=prm["n_centroids"],
            n_probe=prm["n_probe"],
        )
    elif fam == "ivf_kmeans":
        cents = train_centroids_kmeans(
            corpus,
            n_centroids=prm["n_centroids"],
            n_iters=prm["n_iters"],
            id_col=id_col,
            vec_col=vec_col,
        )
        out = ivf_topk(
            corpus,
            queries,
            k,
            id_col=id_col,
            vec_col=vec_col,
            n_probe=prm["n_probe"],
            centroids=cents,
        )
    elif fam == "pq_adc":
        books = PQ.pq_train_codebooks(
            corpus, prm["m"], prm["kc"], dim, id_col=id_col, vec_col=vec_col
        )
        out = PQ.pq_adc_topk(corpus, queries, books, k, id_col, vec_col)
    elif fam in ("ivf_pq", "ivf_pq_refined"):
        kcents = train_centroids_kmeans(
            corpus, n_centroids=prm["nlist"], n_iters=2, id_col=id_col, vec_col=vec_col
        )
        cents = [v for _, v in kcents]
        res = PQ.ivf_residuals(corpus, cents, id_col, vec_col).localCheckpoint()
        books = PQ.pq_train_codebooks(
            res, prm["m"], prm["kc"], dim, id_col=id_col, vec_col="res"
        )
        fn = PQ.ivf_pq_topk_refined if fam == "ivf_pq_refined" else PQ.ivf_pq_topk
        kwargs = {"n_probe": prm["n_probe"], "id_col": id_col, "vec_col": vec_col}
        if fam == "ivf_pq_refined":
            kwargs["refine_mult"] = prm["refine_mult"]
        out = fn(corpus, queries, cents, books, k, **kwargs)
    elif fam == "exact":
        fn = cosine_topk if p["metric"] == "cosine" else l2_topk
        out = fn(corpus, queries, k, id_col=id_col, vec_col=vec_col)
    else:  # pragma: no cover - ANN_FRONTIER and this dispatch move together
        raise ValueError(f"ann_topk cannot dispatch family {fam!r}")
    return out.select("query_id", "neighbor_id", "rank")


def ann_frontier(dim: int = 64) -> list[dict]:
    """The committed ANN frontier as plain data — one row per config with
    its floor, measured point, metric, and byte costs at ``dim`` — for
    notebooks/UIs that want to SHOW the tradeoff ann_plan routes over.
    Sorted by scan bytes (the planner's primary key)."""
    rows = [
        {
            "family": c["family"],
            "config": c["config"],
            "floor": c["floor"],
            "measured_recall": c["measured_recall"],
            "measured_secs": c["measured_secs"],
            "metric": c["metric"],
            "stored_bytes_per_vec": c["stored"](dim),
            "scan_bytes_per_vec": c["scan"](dim),
        }
        for c in ANN_FRONTIER
    ]
    return sorted(rows, key=lambda r: (r["scan_bytes_per_vec"], r["family"]))
