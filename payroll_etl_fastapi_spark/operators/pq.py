"""Product quantization (PQ): compress embeddings to a few bytes per vector
and search them without decompression — the FAISS IVF-PQ storage/search
format that makes billion-vector ANN affordable. Each vector splits into
``m`` sub-blocks; each block quantizes to its nearest of ``k`` per-block
centroids, so a 64-float vector becomes ``m`` small codes. Asymmetric
distance computation (ADC) scores a query against CODES only: per query a
(block, code) → distance TABLE of m·k entries, and a vector's distance is
the sum of its m table lookups.

Determinism contract (the gate's SQL oracle replays every step):

- distances are pure fixed-order *,-,+ chains over doubles — IEEE-exact in
  any engine, no transcendentals;
- encode argmin breaks ties toward the smaller code via struct-min;
- ADC table entries are snapped to integer micros BEFORE the per-vector
  sum (4 integers sum exactly; 4 doubles would be order-sensitive), and
  ranking orders by (micros, id) — fully integer-deterministic.

Scale shape (100 TB of vectors):

- `pq_encode` is a pure projection (m·k fixed-order distance expressions
  inside one WholeStageCodegen stage) — no shuffle, no Python;
- `pq_adc_topk` joins the exploded codes against a BROADCAST per-query
  table (|queries|·m·k rows — tiny by construction), then one grouped sum
  and a per-query top-k window: the corpus is scanned once and shuffled
  only on (query, vector) partial sums. A Pandas-UDF table-lookup variant
  would trade the join for in-process arrays; this shape keeps the gate
  JVM-only and oracle-replayable;
- `pq_train_codebooks` runs the deterministic per-block Lloyd iterations
  (same snapped-integer-mean convention as the IVF k-means trainer).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ivf_residuals",
    "PQ_SEED",
    "pq_codebooks_random",
    "pq_train_codebooks",
    "pq_encode",
    "pq_pack_codes",
    "pq_unpack_codes",
    "pq_adc_topk",
    "pq_adc_topk_packed",
    "ivf_centroids_random",
    "ivf_pq_topk",
    "ivf_pq_topk_refined",
    "ivf_pq_encode_packed",
    "ivf_pq_topk_packed",
    "sq8_train_bounds",
    "sq8_encode_packed",
    "sq8_topk",
    "ivf_sq8_encode_packed",
    "ivf_sq8_topk",
]

PQ_SEED = 77
SNAP = 1 << 20  # trainer mean snap (matches similarity.SNAP convention)


def pq_codebooks_random(
    m: int, k: int, dim: int, seed: int = PQ_SEED
) -> list[list[list[float]]]:
    """m blocks × k centroids × (dim/m) values of seeded literals, rounded
    to 6 decimals so the SQL oracle embeds the EXACT same doubles. A fixed
    random codebook is the oracle-friendly stand-in for a trained one —
    the encode/ADC math is identical (cf. ivf_topk's literal centroids vs
    ann_ivf_kmeans's trained ones)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} blocks")
    rng = random.Random(seed)
    dsub = dim // m
    return [
        [[round(rng.uniform(-0.5, 0.5), 6) for _ in range(dsub)] for _ in range(k)]
        for _ in range(m)
    ]


def _block_dist(vec: Column | str, off: int, centroid: list[float]) -> Column:
    """Squared L2 distance of vec[off : off+len] to a literal centroid as a
    LEFT-ASSOCIATIVE +-chain — the fixed evaluation order both engines
    share, making the double bit-identical.

    Pass the COLUMN NAME (str) on hot construction paths: the chain is then
    built as ONE server-parsed F.expr string instead of ~6 py4j round trips
    per dimension — measured ~12 s → sub-second plan-build time for the
    IVF-PQ gate's ~2.6k-term tree. The parsed AST is identical (explicit
    element_at + D-suffixed double literals), so results are bit-equal;
    tests pin str ≡ Column construction."""
    if isinstance(vec, str):
        terms = []
        for i, c in enumerate(centroid):
            t = f"(CAST(element_at(`{vec}`, {off + i + 1}) AS DOUBLE) - ({float(c)!r}D))"
            terms.append(f"{t} * {t}")
        return F.expr(" + ".join(terms))
    out: Column | None = None
    for i, c in enumerate(centroid):
        t = F.element_at(vec, off + i + 1).cast("double") - F.lit(float(c))
        sq = t * t
        out = sq if out is None else out + sq
    assert out is not None
    return out


def _book_lit(book: list[list[float]]) -> Column:
    """One per-block codebook as a FOLDABLE ``array<array<double>>`` literal:
    ConstantFolding collapses it to a single Literal node before codegen, so
    the generated code no longer grows with k·dsub. The previous unrolled
    per-centroid +-chains generated ~m·k·dsub expression nodes in one
    projection, pushing janino past its 64 KB method limit — whole-stage
    codegen silently fell back to interpreted eval on every encode/ADC run."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")" for c in book
        )
        + ")"
    )


def _book_sql(book: list[list[float]]) -> str:
    """The foldable codebook literal as raw SQL text (see _book_lit)."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")" for c in book
        )
        + ")"
    )


def _block_dist_cells(vec_col: str, off: int, dsub: int, book: list[list[float]]) -> Column:
    """Array of (d, i) structs: squared L2 of the vector's block slice to
    EVERY centroid of one block, as zip_with/aggregate folds over the
    foldable codebook literal. The fold accumulates left-associatively from
    0.0 in element order — bit-identical to the literal +-chain (IEEE:
    0.0 + x == x for the non-negative squared terms, same argument as the
    IVF coarse-assignment fold below) — but evaluates as a runtime loop,
    keeping the codegen method size constant in k and dsub.

    SERVER-PARSED as one F.expr string (round 12, the band_signatures
    lesson): the Column/HOF construction of m blocks cost ~5,700 py4j round
    trips ≈ 1-2 s of driver wall per PLAN (cProfile on ivf_pq_topk); the
    parsed AST — transform over the codebook literal with the identical
    zip_with/aggregate fold — is node-for-node the Column form, so every
    distance and tie-break stays bit-equal (pinned by test_pq)."""
    return F.expr(
        f"transform({_book_sql(book)}, (c, i) -> named_struct("
        f"'d', aggregate(zip_with(slice(`{vec_col}`, {off + 1}, {dsub}), c, "
        f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        f"0.0D, (acc, x) -> acc + x), 'i', i))"
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, [keep...,] c0 … c{m-1}): each block's nearest-centroid code
    (squared-L2 argmin, ties to the smaller code via (dist, code)
    struct-min). Pure projection — the 100 TB path encodes in one scan,
    and the fold-based distance cells keep the whole stage inside one
    compiled WholeStageCodegen method regardless of m·k·dsub."""
    dsub = len(codebooks[0][0])
    cols = [F.col(id_col).alias("id"), *[F.col(c) for c in keep]]
    for j, book in enumerate(codebooks):
        cells = _block_dist_cells(vec_col, j * dsub, dsub, book)
        cols.append(F.array_min(cells).getField("i").alias(f"c{j}"))
    return df.select(*cols)


def pq_pack_codes(
    codes: DataFrame, m: int, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(id, [keep...,] code binary): the m per-block codes packed into ONE
    m-byte binary column — the production storage format (FAISS stores
    exactly this: a billion 64-dim float vectors become a billion m-byte
    rows; at m=8 that is a 32× storage/scan-width reduction over the raw
    doubles). Input is pq_encode's output (id, c0 … c{m-1}); each code
    must fit one byte (k ≤ 256, which every PQ config here satisfies —
    byte-per-code is also FAISS's default layout).

    JVM-only projection: code → zero-padded hex pair → concat → unhex.
    No shuffle, no Python."""
    hex_pairs = [
        F.lpad(F.hex(F.col(f"c{j}").cast("int")), 2, "0") for j in range(m)
    ]
    return codes.select(
        "id",
        *[F.col(c) for c in keep],
        F.unhex(F.concat(*hex_pairs)).alias("code"),
    )


def pq_unpack_codes(
    packed: DataFrame, m: int, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(id, [keep...,] c0 … c{m-1}): inverse of pq_pack_codes — byte j of
    the binary column back to block j's integer code (hex window → base-16
    conv). Search does NOT need this (pq_adc_topk_packed melts the bytes
    directly); it exists for audit/debug and the round-trip contract
    test."""
    cols = [F.col("id"), *[F.col(c) for c in keep]]
    hx = F.hex(F.col("code"))
    for j in range(m):
        cols.append(
            F.conv(F.substring(hx, j * 2 + 1, 2), 16, 10).cast("int").alias(f"c{j}")
        )
    return packed.select(*cols)


def _melt_packed(packed: DataFrame, m: int, keep: tuple[str, ...] = ()) -> DataFrame:
    """(id, [keep...,] block, code) from the packed binary column: explode
    block indices, slice one hex pair per block. The ADC join consumes
    this directly — the packed column never round-trips through m int
    columns."""
    hx = F.hex(F.col("code"))
    return (
        packed.select(
            "id",
            *[F.col(c) for c in keep],
            hx.alias("_hx"),
            F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("block"),
        )
        .select(
            "id",
            *keep,
            "block",
            F.conv(
                F.substring(F.col("_hx"), F.col("block") * 2 + 1, 2), 16, 10
            )
            .cast("int")
            .alias("code"),
        )
    )


def pq_adc_topk_packed(
    packed: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_adc_topk over a PRE-ENCODED, byte-packed corpus — the production
    search shape: the stored index is (id, m-byte code) rows written once
    by pq_encode → pq_pack_codes; queries build their broadcast distance
    table against the codebooks and the scan touches only id + m bytes per
    vector (never the raw embeddings). Identical ranking to pq_adc_topk on
    the same codes — pytest-pinned."""
    m = len(codebooks)
    melted = _melt_packed(packed, m)
    table = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(_adc_entries(vec_col, codebooks)).alias("e"),
        )
        .select("query_id", "e.block", "e.code", "e.du")
    )
    return _adc_rank(melted, table, k, join_keys=["block", "code"])


def _adc_entries(vec_col: str, codebooks: list[list[list[float]]]) -> Column:
    """The per-query ADC distance table as ONE array column of
    (block, code, du) structs — du = the query block's squared L2 to that
    code's centroid, snapped to integer micros. Fold-built per block and
    concatenated, for the same constant-codegen-size reason as
    _block_dist_cells (the unrolled m·k struct literals with chained
    distances were the other 64 KB codegen blowup site)."""
    dsub = len(codebooks[0][0])

    # SERVER-PARSED (round 12, same rationale as _block_dist_cells): one
    # F.expr for the whole m-block entry array instead of m HOF lambda
    # constructions — the parsed AST is node-identical, values bit-equal.
    def entry_sql(j: int, book: list[list[float]]) -> str:
        return (
            f"transform({_book_sql(book)}, (c, i) -> named_struct("
            f"'block', {j}, 'code', i, 'du', "
            f"CAST(floor(aggregate(zip_with(slice(`{vec_col}`, {j * dsub + 1}, {dsub}), c, "
            f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
            f"0.0D, (acc, x) -> acc + x) * 1000000.0D + 0.5D) AS BIGINT)))"
        )

    per_block = [entry_sql(j, book) for j, book in enumerate(codebooks)]
    return F.expr(
        per_block[0]
        if len(per_block) == 1
        else "concat(" + ", ".join(per_block) + ")"
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, adc_micros, rank): top-k nearest corpus
    vectors per query by ADC — sum over blocks of the query's snapped
    distance-table entry for the vector's code. Self-matches excluded, the
    usual ANN-gate convention."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    melted = codes.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("block"), F.col(f"c{j}").alias("code"))
                    for j in range(m)
                ]
            )
        ).alias("bc"),
    ).select("id", "bc.block", "bc.code")
    table = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(_adc_entries(vec_col, codebooks)).alias("e"),
        )
        .select("query_id", "e.block", "e.code", "e.du")
    )
    return _adc_rank(melted, table, k, join_keys=["block", "code"])


def pq_train_codebooks(
    df: DataFrame,
    m: int,
    k: int,
    dim: int,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-block deterministic Lloyd k-means: init = the k lowest-id
    vectors' block slices; assignment = the same struct-min argmin encode
    uses; update = integer-snapped per-dimension means (empty clusters keep
    their centroid). Every iteration trains ALL m blocks in ONE distributed
    job: the m per-block argmins are m fold columns of a single projection,
    posexplode fans the full vector out once, and one (block, code, bpos)
    grouped aggregate yields every block's snapped sums — m·k·dsub grouped
    rows collected per iteration (the pre-r8 per-(block, iteration) loop
    launched m separate scan jobs per iteration; identical snapped sums,
    so the trained books are bit-equal — pinned by
    test_trained_codebooks_match_python_replica)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} blocks")
    dsub = dim // m
    vec = F.col(vec_col)
    init = (
        df.select(F.col(id_col).alias("id"), vec.alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"need >= {k} vectors to init {k} centroids, got {len(init)}")
    books: list[list[list[float]]] = [
        [[float(r.v[j * dsub + d]) for d in range(dsub)] for r in init]
        for j in range(m)
    ]
    for _ in range(n_iters):
        codes_arr = F.array(
            *[
                F.array_min(
                    _block_dist_cells(vec_col, j * dsub, dsub, books[j])
                ).getField("i")
                for j in range(m)
            ]
        )
        block = F.floor(F.col("pos") / F.lit(dsub)).cast("int")
        # two-step select: computing the argmin array in the same select as
        # posexplode trips an analyzer bug (the HOF lambda struct-field
        # aliases are dropped during generator resolution and getField("i")
        # fails); materializing _codes in its own projection first is safe
        stats = (
            df.select(codes_arr.alias("_codes"), vec.alias("_v"))
            .select("_codes", F.posexplode("_v").alias("pos", "val"))
            .select(
                block.alias("block"),
                F.element_at(F.col("_codes"), block + 1).alias("code"),
                (F.col("pos") % dsub).alias("bpos"),
                F.col("val"),
            )
            .groupBy("block", "code", "bpos")
            .agg(
                F.sum(
                    F.floor(F.col("val").cast("double") * SNAP + F.lit(0.5)).cast(
                        "long"
                    )
                ).alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
            .collect()
        )
        by_key: dict[tuple[int, int], dict[int, float]] = {}
        for r in stats:
            by_key.setdefault((int(r.block), int(r.code)), {})[int(r.bpos)] = (
                float(r.s) / int(r.c) / float(SNAP)
            )
        books = [
            [
                [d[p] for p in sorted(d)] if (d := by_key.get((j, ci))) else old
                for ci, old in enumerate(book)
            ]
            for j, book in enumerate(books)
        ]
    return books


def ivf_centroids_random(
    nlist: int, dim: int, seed: int = PQ_SEED + 1
) -> list[list[float]]:
    """nlist coarse-quantizer centroids of seeded literals rounded to 6
    decimals — the data-free oracle-friendly stand-in for a trained coarse
    quantizer (same convention as pq_codebooks_random; the trained path is
    similarity.train_centroids_kmeans)."""
    rng = random.Random(seed)
    return [
        [round(rng.uniform(-0.5, 0.5), 6) for _ in range(dim)]
        for _ in range(nlist)
    ]


def _coarse_assign(spark, centroids: list[list[float]], vec: Column):
    """(one_row, mapped): the broadcast (cent_id, cent_vec) struct array and
    the per-row (L2-distance, cent_id) struct transform — the shared coarse-
    assignment building blocks of ivf_pq_topk and ivf_residuals. Fold-based
    L2 keeps the stage inside janino's method limit (see ivf_pq_topk);
    array_sort pins _cents to cent_id order so element_at(list_id + 1)
    retrieves the assigned centroid."""
    # one_row as a pure LITERAL select (round 12): the createDataFrame +
    # collect_list/array_sort aggregate built the identical VALUE — an
    # array of (cent_id, cent_vec) structs in cent_id order — but cost a
    # createDataFrame round trip plus one broadcast-side aggregate job per
    # call site. The literal is already in enumerate order; repr(float)
    # round-trips the exact IEEE double through the SQL parser.
    cents_sql = "array(" + ", ".join(
        f"named_struct('cent_id', {i}, 'cent_vec', array("
        + ",".join(f"{float(x)!r}D" for x in c)
        + "))"
        for i, c in enumerate(centroids)
    ) + ")"
    one_row = F.broadcast(
        spark.range(1).select(F.expr(cents_sql).alias("_cents"))
    )
    mapped = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    c["cent_vec"],
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            c["cent_id"].alias("i"),
        ),
    )
    return one_row, mapped


def ivf_residuals(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_col, list_id, res): each vector's coarse inverted list and its
    RESIDUAL (vector − list centroid) under the exact assignment ivf_pq_topk
    uses. This is the FAISS-style training input for residual codebooks:

        res = ivf_residuals(corpus, centroids)
        books = pq_train_codebooks(res, m, k, dim, id_col=..., vec_col="res")
        ivf_pq_topk(corpus, queries, centroids, books, ...)

    Training books on residuals instead of raw vectors matters because the
    codebooks only ever see residuals at encode/search time — raw-vector
    books spend their bit budget modeling the coarse structure the
    quantizer already removed (measured on the clustered test corpus:
    recall@10 0.43 raw-trained → see PLANS.md §ANN recall for the residual
    numbers). One scan, no shuffle: assignment and subtraction are a single
    broadcast projection."""
    one_row, mapped = _coarse_assign(df.sparkSession, centroids, F.col(vec_col))
    list_id = F.array_min(mapped).getField("i")
    res = F.zip_with(
        F.col(vec_col),
        F.element_at(F.col("_cents"), list_id + 1).getField("cent_vec"),
        lambda a, b: a.cast("double") - b,
    )
    return df.crossJoin(one_row).select(
        F.col(id_col), list_id.alias("list_id"), res.alias("res")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the FAISS billion-vector index shape — a coarse quantizer
    routes each vector to an inverted list, PQ codes compress the RESIDUAL
    (vector − its list's centroid), and a query ADC-scans only its
    ``n_probe`` nearest lists.

    (query_id, neighbor_id, adc_micros, rank), self-matches excluded.

    Determinism (the gate's oracle replays every step): coarse assignment
    is the same struct-min L2 argmin as pq_encode (ties → smaller list id);
    residuals subtract in a fixed per-dimension order (zip_with, double);
    probe selection sorts (distance, list_id) structs with array_sort — no
    window, no shuffle; ADC entries snap to integer micros before the sum.

    Scale shape: encode is one scan (assignment argmin + residual zip_with
    + block argmins inside a single projection, no shuffle); search joins
    the exploded codes against a BROADCAST (list_id, block, code) table of
    |queries|·n_probe·m·k rows, so only vectors in probed lists produce
    join matches — the corpus-side work is one scan + one (query, vector)
    partial-sum shuffle, and the inverted-list restriction happens in the
    join, not a per-list scan loop."""
    m = len(codebooks)
    # coarse assignment via ONE broadcast row of (cent_id, cent_vec)
    # structs and a fold-based L2 argmin: the unrolled literal chains for
    # nlist x dim terms pushed the fused encode stage past janino's 64 KB
    # method limit (whole-stage codegen fell back to interpreted eval);
    # the fold is bit-identical to the chain (IEEE 0.0 + x == x for the
    # non-negative squared terms). array_sort pins _cents to cent_id
    # order so element_at(list_id + 1) retrieves the assigned centroid.
    enc_in = ivf_residuals(corpus, centroids, id_col, vec_col)
    codes = pq_encode(enc_in, codebooks, id_col=id_col, vec_col="res", keep=("list_id",))
    melted = codes.select(
        "id",
        "list_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("block"), F.col(f"c{j}").alias("code"))
                    for j in range(m)
                ]
            )
        ).alias("bc"),
    ).select("id", "list_id", "bc.block", "bc.code")
    table = _ivf_pq_query_table(
        queries, centroids, codebooks, n_probe, id_col, vec_col
    )
    return _adc_rank(melted, table, k, join_keys=["list_id", "block", "code"])


def _ivf_pq_query_table(
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, list_id, block, code, du): each query's micro-snapped
    RESIDUAL distance table restricted to its n_probe nearest lists — the
    tiny broadcast side every IVF-PQ search variant joins against. Probe
    selection sorts (distance, list_id) structs with array_sort (no window,
    no shuffle)."""
    vec = F.col(vec_col)
    one_row, mapped = _coarse_assign(queries.sparkSession, centroids, vec)
    probed = (
        queries.crossJoin(one_row)
        .select(
            F.col(id_col).alias("query_id"),
            vec.alias("qv"),
            F.col("_cents"),
            F.explode(F.slice(F.array_sort(mapped), 1, n_probe)).alias("p"),
        )
        .select("query_id", "qv", "_cents", F.col("p.i").alias("list_id"))
    )
    qres = F.zip_with(
        F.col("qv"),
        F.element_at(F.col("_cents"), F.col("list_id") + 1).getField("cent_vec"),
        lambda a, b: a.cast("double") - b,
    )
    probed_res = probed.select("query_id", "list_id", qres.alias("qres"))
    return probed_res.select(
        "query_id",
        "list_id",
        F.explode(_adc_entries("qres", codebooks)).alias("e"),
    ).select("query_id", "list_id", "e.block", "e.code", "e.du")


def _adc_rank(
    melted: DataFrame, table: DataFrame, k: int, join_keys: list[str]
) -> DataFrame:
    """Shared ADC scoring tail: broadcast the per-query table into the
    melted code stream, sum integer micros per (query, vector), rank with
    the (micros, id) integer-deterministic tiebreak."""
    scored = (
        melted.join(F.broadcast(table), join_keys)
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", "id")
        .agg(F.sum("du").alias("adc_micros"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_micros"), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("id").alias("neighbor_id"), "adc_micros", "rank")
    )


def ivf_pq_topk_refined(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    n_probe: int = 2,
    refine_mult: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search with an exact re-rank tail (FAISS ``IndexRefineFlat``):
    the ADC index over-fetches ``k * refine_mult`` candidates per query,
    then ``similarity.refine_topk`` recomputes exact squared-L2 for JUST
    those candidates from the original vectors and keeps the true top-``k``.
    Output: (query_id, neighbor_id, l2_micros, rank).

    This is the production answer to PQ's quantization loss: recall becomes
    "did the true neighbor make the shortlist" (bounded by probe coverage)
    instead of "did the 8-byte code rank it first". Cost: one extra corpus
    scan pruned by a broadcast id join of |queries| x (k x refine_mult)
    shortlist rows — at 100 TB the stored packed index serves the ADC pass
    and only shortlisted rows' vectors are ever read back."""
    from payroll_etl_fastapi_spark.operators import similarity as sim

    shortlist = ivf_pq_topk(
        corpus,
        queries,
        centroids,
        codebooks,
        k=k * refine_mult,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    return sim.refine_topk(
        corpus, shortlist, queries, k, id_col=id_col, vec_col=vec_col
    )


def ivf_pq_encode_packed(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, code binary): the complete FAISS stored-index row —
    coarse list assignment + the residual's m PQ codes packed to m bytes
    (pq_pack_codes). Write this once; every later search reads id + an int
    + m bytes per vector and never the embeddings. One scan, no shuffle."""
    enc = pq_encode(
        ivf_residuals(corpus, centroids, id_col, vec_col),
        codebooks,
        id_col=id_col,
        vec_col="res",
        keep=("list_id",),
    )
    return pq_pack_codes(enc, len(codebooks), keep=("list_id",))


def ivf_pq_topk_packed(
    packed: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ivf_pq_topk over the PRE-ENCODED byte-packed index
    (ivf_pq_encode_packed's output) — the production search shape: melt
    the stored bytes per probed list and join the broadcast query table;
    the raw embeddings are never touched. Ranking identical to
    ivf_pq_topk on the same index — pytest-pinned."""
    m = len(codebooks)
    melted = _melt_packed(packed, m, keep=("list_id",))
    table = _ivf_pq_query_table(
        queries, centroids, codebooks, n_probe, id_col, vec_col
    )
    return _adc_rank(melted, table, k, join_keys=["list_id", "block", "code"])


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (round 8) — the OTHER FAISS storage format
# (IndexScalarQuantizer QT_8bit): one byte per DIMENSION instead of PQ's
# byte per block. 4x scan-width reduction over float32 at near-exact
# recall; training is a single exact min/max aggregate (no iterations),
# so the oracle replays it with zero literal pinning.
# ---------------------------------------------------------------------------


def sq8_train_bounds(
    corpus: DataFrame, dim: int, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus — SQ8's ENTIRE training:
    one column-pruned aggregate (2*dim cells, map-side partials), collected
    as a constant-size driver row. min/max are exact (no arithmetic), so
    the SQL oracle recomputes identical bounds from the same table."""
    aggs = []
    for i in range(dim):
        x = F.element_at(F.col(vec_col), i + 1).cast("double")
        aggs.append(F.min(x).alias(f"lo{i}"))
        aggs.append(F.max(x).alias(f"hi{i}"))
    row = corpus.agg(*aggs).first()
    if row is None or row["lo0"] is None:
        # min/max over zero rows is NULL in every dimension; float(None)
        # would raise an unhelpful TypeError downstream (ADVICE r8)
        raise ValueError("cannot train SQ8 bounds on an empty corpus")
    return [(float(row[f"lo{i}"]), float(row[f"hi{i}"])) for i in range(dim)]


def _sq8_arrays_sql(bounds: list[tuple[float, float]]) -> tuple[str, str]:
    """(lo, span) double-array SQL literals; span = hi - lo computed in
    Python doubles — the oracle performs the SAME single subtraction."""
    lo = "array(" + ",".join(f"{float(lo)!r}D" for lo, _ in bounds) + ")"
    span = "array(" + ",".join(f"{float(hi - lo)!r}D" for lo, hi in bounds) + ")"
    return lo, span


def sq8_encode_packed(
    corpus: DataFrame,
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code binary of dim bytes): code_i = clamp(floor((x_i - lo_i) *
    255 / span_i + 0.5), 0, 255); degenerate dimensions (span 0) encode 0.
    One projection (array-local transform -> hex pairs -> unhex), no
    shuffle, no Python — the pq_pack_codes storage discipline at byte-per-
    dimension granularity."""
    return corpus.select(
        F.col(id_col).alias("id"),
        F.expr(_sq8_code_sql(bounds, vec_col)).alias("code"),
    )


def _sq8_code_sql(bounds: list[tuple[float, float]], vec_col: str) -> str:
    """The encode expression shared by the flat and IVF SQ8 index builders:
    packed binary of clamp(floor((x_i - lo_i) * 255 / span_i + 0.5))."""
    dim = len(bounds)
    lo, span = _sq8_arrays_sql(bounds)
    codes = (
        f"transform(sequence(1, {dim}), i -> "
        f"CASE WHEN element_at({span}, i) > 0.0D THEN "
        f"least(255, greatest(0, CAST(floor((CAST(element_at(`{vec_col}`, i) "
        f"AS DOUBLE) - element_at({lo}, i)) * 255.0D / element_at({span}, i) "
        f"+ 0.5D) AS INT))) ELSE 0 END)"
    )
    return f"unhex(array_join(transform({codes}, c -> lpad(hex(c), 2, '0')), ''))"


def sq8_topk(
    packed: DataFrame,
    queries: DataFrame,
    bounds: list[tuple[float, float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric SQ8 search over the packed index: the EXACT query vector
    against each stored row decoded from its codes (dec_i = lo_i + code_i *
    span_i / 255), squared-L2 micro-snapped, (micros, id) tiebreak.
    Output: (query_id, neighbor_id, d_micros, rank), self excluded.

    Scale shape: one scan of the byte index (the embeddings are never
    touched), decode + distance inside a single projection against the
    BROADCAST query side, one (query, micros) rank window. Like l2_topk
    this is a full-index scan per query batch — SQ8 is the storage-
    compression point on the frontier (near-exact recall), IVF-PQ the
    probe-bounded one; compose with ivf lists for both.

    ``packed`` should be a STORED/materialized index (a parquet table or
    a checkpointed frame — production always stores it): passing the
    lazy sq8_encode_packed projection straight in lets CollapseProject
    merge the per-dimension encode under the query cross join, where it
    re-evaluates once per (row, query) PAIR (measured 6.6x at sf0.1)."""
    c = packed.select(
        F.col("id").alias("neighbor_id"), F.expr(_sq8_dec_sql(bounds)).alias("dec")
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("dec"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(dist * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias("d_micros"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d_micros"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _sq8_dec_sql(bounds: list[tuple[float, float]]) -> str:
    """The decode expression shared by every SQ8 search variant:
    array<double> of lo_i + code_i * span_i / 255 from the packed binary
    `code` column."""
    dim = len(bounds)
    lo, span = _sq8_arrays_sql(bounds)
    return (
        f"transform(sequence(1, {dim}), i -> element_at({lo}, i) + "
        f"(CAST(conv(substring(hex(code), (i - 1) * 2 + 1, 2), 16, 10) "
        f"AS DOUBLE) * element_at({span}, i)) / 255.0D)"
    )


def ivf_sq8_encode_packed(
    corpus: DataFrame,
    centroids: list[list[float]],
    bounds: list[tuple[float, float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, list_id, code): the IVF-SQ8 stored index — coarse list
    assignment (the shared fold argmin, ties to the smaller list) plus the
    RAW vector's per-dimension byte codes (FAISS IndexIVFScalarQuantizer
    with by_residual=False: global bounds, so decode needs no centroid
    add-back). One scan, no shuffle; dim bytes + an int per vector."""
    vec = F.col(vec_col)
    one_row, mapped = _coarse_assign(corpus.sparkSession, centroids, vec)
    return corpus.crossJoin(one_row).select(
        F.col(id_col).alias("id"),
        F.element_at(F.array_sort(mapped), 1).getField("i").alias("list_id"),
        F.expr(_sq8_code_sql(bounds, vec_col)).alias("code"),
    )


def ivf_sq8_topk(
    packed: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    bounds: list[tuple[float, float]],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe-bounded SQ8 search over the stored (id, list_id, code) index:
    each query scans only its ``n_probe`` nearest inverted lists (the
    ivf_pq_topk probe selection — array_sort over the shared fold
    distances, no shuffle), decoding codes to exact-query asymmetric
    squared-L2. Completes the quantization matrix: IVF x {PQ (8 bytes,
    recall-bounded), SQ8 (dim bytes, near-exact)} — SQ8 keeps fine ranking
    the 8-byte codes lose, IVF keeps the scan probe-bounded where plain
    sq8_topk is a full-index pass.

    Output: (query_id, neighbor_id, d_micros, rank), self excluded. The
    probed join is one equality join of the index against the BROADCAST
    |queries| x n_probe (query, list) pairs — only probed lists' rows
    survive the join; the index never shuffles."""
    vec = F.col(vec_col)
    one_row, mapped = _coarse_assign(queries.sparkSession, centroids, vec)
    probes = (
        queries.crossJoin(one_row)
        .select(
            F.col(id_col).alias("query_id"),
            vec.alias("q_vec"),
            F.explode(F.slice(F.array_sort(mapped), 1, n_probe)).alias("p"),
        )
        .select("query_id", "q_vec", F.col("p.i").alias("list_id"))
    )
    cand = packed.select(
        F.col("id").alias("neighbor_id"),
        "list_id",
        F.expr(_sq8_dec_sql(bounds)).alias("dec"),
    ).join(F.broadcast(probes), "list_id")
    dist = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("dec"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(dist * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("long")
            .alias("d_micros"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d_micros"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
