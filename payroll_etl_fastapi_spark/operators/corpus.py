"""Corpus-preparation operators for training-data pipelines: deterministic
train/val/test splitting, sequence packing via a distributed prefix sum,
stratified hash sampling, and PII scrubbing.

These extend the reference's ETL surface (load → clean → dedupe → publish,
/root/reference/src/etl.py:15-60) to the operations an LLM-corpus pipeline
needs after dedup. Everything is expressed with built-in JVM expressions —
no Python UDFs — and every random-looking choice is a deterministic content
hash, so results are reproducible run-to-run and replayable in ANSI SQL.

Scale notes per operator are in the docstrings; the shared design rule is
that nothing here depends on a global sort or a driver-side loop. The one
global-order construct (sequence packing's running token count) is built as
a two-level prefix sum over range partitions, never a single-partition
window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# split-fraction buckets out of 100: [0, TRAIN) train, [TRAIN, VAL) val,
# [VAL, 100) test — shared with the SQL oracle generator
TRAIN_UPPER = 80
VAL_UPPER = 90


def h28(col: Column) -> Column:
    """28-bit md5 hash (first 7 hex chars → bigint) — bit-identical in Spark
    (conv) and DuckDB ('0x' || … cast); the family-wide deterministic hash."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def split_of(fingerprint: Column) -> Column:
    """train/val/test assignment from a CONTENT fingerprint, not the row id:
    hashing the fingerprint guarantees every duplicate of a document lands in
    the same split, so dedup-survivor choice can never leak val/test content
    into train. Pure projection — no shuffle, no state, works identically on
    100 TB."""
    bucket = h28(fingerprint) % 100
    return (
        F.when(bucket < TRAIN_UPPER, F.lit("train"))
        .when(bucket < VAL_UPPER, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def packed_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in ``id_col``
    order into one virtual token stream and each document is assigned to the
    pack (training sequence) containing its first token:
    ``pack_id = (running_total_before_doc) div budget``.

    The running total is a DISTRIBUTED prefix sum, not a single-partition
    window: range-partition by id, cumsum within each partition, then add the
    per-partition offsets (a ~num_partitions-row aggregate joined back with a
    broadcast). Both consumers of the range exchange share it via Spark's
    ReuseExchange, so partition boundaries are consistent within the plan.
    A 100 TB corpus pays one range shuffle + one tiny broadcast; the naive
    ``Window.orderBy(id)`` formulation would serialize the corpus through a
    single task.

    Returns (id_col, tokens_col, pack_id).
    """
    d = docs.select(id_col, tokens_col).repartitionByRange(num_partitions, id_col)
    d = d.withColumn("__pid", F.spark_partition_id())
    intra = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = d.withColumn("__intra", F.sum(tokens_col).over(intra))
    totals = with_cum.groupBy("__pid").agg(F.sum(tokens_col).alias("__part_total"))
    # offsets: exclusive cumsum over the per-partition totals — num_partitions
    # rows, so the single-partition window here is over a tiny frame
    off_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__part_total").over(off_w), F.lit(0)).alias("__offset"),
    )
    packed = (
        with_cum.join(F.broadcast(offsets), "__pid")
        .withColumn("__cum", F.col("__intra") + F.col("__offset"))
        .withColumn(
            "pack_id",
            F.expr(f"CAST((__cum - {tokens_col}) div {int(budget)} AS BIGINT)"),
        )
    )
    return packed.select(id_col, tokens_col, "pack_id")


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the training-export
    layout step (tfrecord/WebDataset style): examples must reach the trainer
    in a pseudorandom order that is REPRODUCIBLE (same seed → same shards,
    same within-shard order, on any cluster size) so a crashed run resumes
    mid-epoch and two experiments see identical data order.

    Every example gets a shuffle key = md5(seed ":" id); its shard is the
    key's 28-bit prefix mod ``n_shards`` and its position is its (key, id)
    rank within the shard. The assignment depends only on (seed, id):
    re-running, repartitioning, or scaling the cluster cannot perturb it;
    changing ``seed`` draws a fresh permutation.

    Output: (id, skey, shard, pos).

    Scale shape (100 TB): keying and shard assignment are a pure projection;
    ONE exchange on the shard key; the within-shard rank is a per-shard
    window (each shard is a partition — the physical writer is
    ``repartition(n_shards, shard).sortWithinPartitions(skey, id)`` followed
    by a partitioned write, which reuses this exact exchange+sort)."""
    skey = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    keyed = docs.select(F.col(id_col).alias("id"), skey.alias("skey"))
    sharded = keyed.withColumn(
        "shard",
        (F.conv(F.substring("skey", 1, 7), 16, 10).cast("long") % n_shards).cast(
            "int"
        ),
    )
    w = Window.partitionBy("shard").orderBy("skey", "id")
    return sharded.withColumn("pos", F.row_number().over(w) - F.lit(1))


def write_shuffle_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> None:
    """Physically materialize shuffle_shards: one parquet directory per
    shard (``shard=<s>/``), rows stored in shuffle-key order WITHIN each
    shard file so a trainer streaming a shard reads examples in the exact
    deterministic order shuffle_shards assigns. The plan is the documented
    production shape: repartition on the shard key (one exchange) +
    sortWithinPartitions(skey, id) (no global sort) + partitioned write.
    Read-back order == pos order is pytest-pinned."""
    # the output key column is named 'id'; a pre-existing payload column
    # literally named 'id' that is NOT id_col would make the join binding
    # ambiguous (ADVICE r8) — refuse LOUDLY rather than silently dropping
    # user data (ADVICE r9)
    if id_col != "id" and "id" in docs.columns:
        raise ValueError(
            "write_shuffle_shards: payload column 'id' conflicts with the "
            f"output key column (id_col={id_col!r} is renamed to 'id' in "
            "the shard layout); rename the payload column first"
        )
    keyed = shuffle_shards(docs, n_shards, seed, id_col).select(
        "id", "skey", "shard"
    )
    payload = docs.select(
        F.col(id_col).alias("id"),
        *[c for c in docs.columns if c != id_col],
    )
    # the sort LEADS with the partition column: FileFormatWriter requires
    # task rows ordered by partition columns and injects its own
    # shard-only sort (not key-stable) when they are not — sorting
    # (shard, skey, id) satisfies the requirement, so the writer keeps
    # the key order inside every shard file
    (
        keyed.join(payload, "id")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "skey", "id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-token overlapping windows — retrieval/passage prep (the RAG
    chunking step; also the context-window slicer for long-doc training):
    chunk ``c`` covers tokens [c*stride+1, c*stride+chunk_tokens]; with
    stride < chunk_tokens consecutive chunks overlap by chunk_tokens −
    stride tokens so no boundary-straddling passage is ever split across
    a retrieval unit. n_chunks = 1 for docs ≤ chunk_tokens (the whole
    doc), else 1 + ceil((n − chunk_tokens) / stride) — full coverage, the
    last chunk may be shorter, all integer arithmetic. Empty docs emit no
    rows.

    Output: (id, chunk_id, chunk_text, n_tokens).

    Scale shape: tokenize + window build are ARRAY-LOCAL (one transform
    over a sequence of chunk starts, then one explode at ~n/stride rows
    per doc) — a pure projection, no shuffle, no Python."""
    from payroll_etl_fastapi_spark.operators.text import tokens

    w, s = int(chunk_tokens), int(stride)
    if w <= 0 or s <= 0:
        raise ValueError(f"chunk_tokens ({w}) and stride ({s}) must be positive")
    if s > w:
        # the n_chunks formula assumes every chunk start <= size(t); a
        # stride past the window would emit a phantom trailing chunk with
        # empty text and NEGATIVE n_tokens (ADVICE r8)
        raise ValueError(
            f"stride ({s}) must be <= chunk_tokens ({w}): chunks are "
            "overlapping-or-adjacent windows, gaps are not supported"
        )
    t = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 1)
    n = F.size(F.col("t"))
    # integer ceil via expr to keep DIV semantics identical to the oracle
    n_chunks = F.expr(
        f"CASE WHEN size(t) <= {w} THEN 1 "
        f"ELSE 1 + (size(t) - {w} + {s - 1}) DIV {s} END"
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda c: F.struct(
            c.cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice(F.col("t"), c * s + 1, w)).alias("chunk_text"),
            F.least(n - c * s, F.lit(w)).cast("long").alias("n_tokens"),
        ),
    )
    return t.select("id", F.explode(chunks).alias("c")).select(
        "id", "c.chunk_id", "c.chunk_text", "c.n_tokens"
    )


def stratified_sample(
    key: Column,
    rates_per_mille: dict[str, int],
    stratum_col: str = "lang",
) -> Column:
    """Deterministic stratified keep-filter: keep a row iff
    ``h28(key) % 1000 < rate`` for its stratum's rate (‰). Content-hash
    sampling is reproducible, join-free, and stable under re-partitioning —
    unlike ``df.sample`` whose output depends on partition layout. Returns
    the boolean keep COLUMN (apply with ``df.filter``) — it is built purely
    from ``key`` and ``stratum_col``, so no frame parameter belongs in the
    signature."""
    rate = None
    for stratum, r in sorted(rates_per_mille.items()):
        cond = F.col(stratum_col) == stratum
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(0))
    return (h28(key) % 1000) < rate


def weighted_sample(
    docs: DataFrame,
    n: int,
    weight: Column,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — Efraimidis &
    Spirakis 2006 exponential-race keys over hash-derived uniforms: every
    row races with score = -ln(u)/w, u = (h28(seed:id)+1)/2^28, and the n
    SMALLEST scores win. P(row wins the first slot) = w_i/Σw, and
    conditioning repeats over the remainder — the weighted
    without-replacement semantics ("sample 10M docs ∝ quality weight") a
    training-data pipeline needs, in ONE scan.

    Determinism: the uniform comes from the family-wide h28 content hash of
    ``seed`` + the row id, not an RNG — identical under re-partitioning,
    re-runs, and engines (unlike df.sample, whose draw depends on partition
    layout). Scores snap to integer micros before ranking (the unigram-cost
    ln precedent: ln is the one non-correctly-rounded step, and the micro
    snap makes the cross-engine comparison exact in practice — verified
    bit-equal at three scales by the driver gate's oracle); ties resolve by
    id, so the ranking is a total order.

    Weight contract: w > 0 races normally; w = 0 or NULL rows NEVER sample
    (P ∝ 0 — mathematically consistent, documented); a NEGATIVE weight
    raises in-plan (raise_error naming the id) rather than silently winning
    every slot (−ln(u)/w flips sign).

    Scale shape (100 TB): one narrow projection (hash + ln per row) into a
    global top-n — TakeOrderedAndProject, no shuffle, no window over the
    corpus; the rank is minted by a window over the n winners only.
    Returns (id, weight_micro, score_micro, rank), rank 1..n."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = weight.cast("double")
    u = (h28(F.concat(F.lit(f"ws{seed}:"), F.col(id_col).cast("string"))) + 1).cast(
        "double"
    ) / F.lit(float(1 << 28))
    score = F.floor((-F.log(u) / w) * 1_000_000 + F.lit(0.5)).cast("long")
    guarded = (
        F.when(
            w < 0,
            F.expr(
                f"raise_error(concat('weighted_sample: negative weight for "
                f"{id_col} ', CAST({id_col} AS STRING)))"
            ).cast("long"),
        )
        .when(w > 0, score)
        .otherwise(F.lit(None).cast("long"))  # w = 0 / NULL: never sampled
    )
    scored = docs.select(
        F.col(id_col).alias("id"),
        F.floor(w * 1_000_000 + F.lit(0.5)).cast("long").alias("weight_micro"),
        guarded.alias("score_micro"),
    ).filter(F.col("score_micro").isNotNull())
    top = scored.orderBy("score_micro", "id").limit(n)
    win = Window.orderBy("score_micro", "id")
    return top.select(
        "id",
        "weight_micro",
        "score_micro",
        F.row_number().over(win).cast("int").alias("rank"),
    )


def temperature_shares(
    docs: DataFrame,
    stratum_col: str = "source",
    token_col: Column | None = None,
) -> DataFrame:
    """(stratum, n_docs, weight_micro, share_bp, boost_bp): temperature-
    based mixture shares across corpus strata — the multilingual/source
    resampling recipe (mT5 / Llama style, p_s ∝ n_s^α) at α = 1/2, which
    up-weights small sources and damps the head so one giant crawl can't
    drown every minority slice.

    α = 1/2 is the one temperature exponent that is BIT-PORTABLE: sqrt is
    IEEE-754 correctly-rounded in both engines (an arbitrary pow(x, 0.7)
    is not), the per-stratum sqrt snaps to integer micros BEFORE the total
    (integer sums commute — aggregation-order-proof), and shares come from
    integer division only. share_bp = the stratum's mixture share in basis
    points; boost_bp = share relative to its natural (proportional) share,
    >10000 meaning the mixture over-samples the stratum.

    One grouped count + one tiny cross join against the one-row total —
    strata counts are dimension-sized at any corpus scale. ``token_col``
    weights by tokens instead of docs when given."""
    size = token_col if token_col is not None else F.lit(1)
    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum(size).cast("long").alias("n_docs")
    )
    w = F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
        "long"
    )
    per = per.withColumn("weight_micro", w)
    tot = per.agg(
        F.sum("weight_micro").alias("tot_w"), F.sum("n_docs").alias("tot_n")
    )
    # integral DIV end to end — double division truncated can land on the
    # wrong side of an integer boundary; DIV cannot. boost derives from the
    # already-reduced share_bp and the natural share in micro precision so
    # no product exceeds ~1e10 (the naive w·tot_n·1e4 cross-product
    # overflows long at petascale corpus sizes); nat_micro = 0 (a stratum
    # under a millionth of the corpus) yields NULL boost rather than a
    # division error.
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_docs",
            "weight_micro",
            F.expr("weight_micro * 10000 DIV tot_w").alias("share_bp"),
            F.expr(
                "(weight_micro * 10000 DIV tot_w) * 1000000"
                " DIV nullif(n_docs * 1000000 DIV tot_n, 0)"
            ).alias("boost_bp"),
        )
    )


# PII patterns — RE2-compatible subsets so the Java (Spark) and RE2 (DuckDB)
# engines agree: no backrefs, no lookaround
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails then phone numbers with typed placeholders. Pure
    projection (two regexp_replace passes fused into the scan by codegen);
    the pattern subset is chosen to behave identically under Java regex and
    RE2 so the scrub is replayable in the SQL oracle."""
    scrubbed = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(scrubbed, PHONE_RE, "<PHONE>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in ``text`` — counted with the same
    patterns scrub_pii redacts, so counts and redactions can't drift."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), F.lit(0))),
    )


DSIR_BUCKETS = 4096


def dsir_log_weights(
    docs: DataFrame,
    target_col: str | Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much more likely its hashed-feature bag is under the TARGET
    distribution than under the RAW distribution —
    log w(doc) = Σ_tok [ log p_tgt(b(tok)) - log p_raw(b(tok)) ] with
    add-alpha-smoothed bucket unigrams. High-weight docs "look like" the
    target corpus; resampling by these weights is the published recipe for
    selecting pretraining data that matches a quality domain.

    ``target_col`` is a boolean column/expression marking the target
    subset (e.g. lang == 'en'); features are md5-hashed tokens into
    ``buckets`` buckets (portable convention, SQL-replayable).

    Output: (id, n_tokens, log_weight) for docs with >= 1 token. Each
    bucket's log-ratio is snapped to integer microunits BEFORE the per-doc
    sum (the suite's determinism convention), so aggregation order cannot
    perturb the result.

    Plan shape (100 TB): ONE tokenize+explode pass; ONE bucket-keyed
    grouped count with map-side combine — the feature table is <= buckets
    rows TOTAL regardless of corpus size, so both the totals (1 row) and
    the per-bucket log-ratios BROADCAST to the per-doc scoring join (no
    shuffle of the token stream against anything large, no row
    amplification); ONE per-doc grouped sum. Both distributions come from
    the same single pass (a conditional sum splits target from raw).
    No Python, no window, no collect."""
    from payroll_etl_fastapi_spark.operators.text import tokens as _toks

    # no parallelism floor: tokenize→explode→grouped-count — the bucket
    # shuffle spreads the work; the floor measured net-negative on the
    # resample composition (1.7 s → 2.0 s at sf0.1)
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    tok_rows = docs.select(
        F.col(id_col).alias("id"),
        tgt.alias("tgt"),
        F.explode(_toks(F.col(text_col))).alias("tok"),
    )
    b = tok_rows.select(
        "id",
        "tgt",
        (h28(F.concat(F.lit("dsir:"), F.col("tok"))) % buckets).alias("bucket"),
    )
    stats = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.col("tgt").cast("long")).alias("tgt_cnt"),
    )
    totals = stats.agg(
        F.sum("raw_cnt").alias("n_raw"), F.sum("tgt_cnt").alias("n_tgt")
    )
    ab = F.lit(float(alpha) * buckets)
    ratio = F.log(
        (F.col("tgt_cnt") + F.lit(float(alpha))) / (F.col("n_tgt") + ab)
    ) - F.log((F.col("raw_cnt") + F.lit(float(alpha))) / (F.col("n_raw") + ab))
    ratios = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(ratio * F.lit(1e6) + F.lit(0.5)).cast("long").alias("micro"),
        )
    )
    return (
        b.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (F.sum("micro") / F.lit(1e6)).alias("log_weight"),
        )
    )


GUMBEL_DENOM = float((1 << 28) + 1)


def gumbel_noise(id_col: Column, salt: str = "gumbel:") -> Column:
    """Deterministic standard-Gumbel draw per id: u = (h28(salt||id)+1) /
    (2^28+1) in (0,1), g = -ln(-ln(u)). Hash-derived, so both engines draw
    the SAME noise — the trick that makes randomized resampling
    SQL-replayable (and retry/partition-layout-proof on a cluster: a task
    retry re-derives identical samples, where rand() would not)."""
    u = (h28(F.concat(F.lit(salt), id_col.cast("string"))) + F.lit(1)) / F.lit(
        GUMBEL_DENOM
    )
    return -F.log(-F.log(u))


def dsir_resample(
    docs: DataFrame,
    target_col: str | Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """The full DSIR recipe (Xie et al. 2023): importance weights +
    Gumbel-top-k resampling — sampling k documents WITHOUT replacement with
    probability proportional to their (softmax'd) importance weights is
    exactly "take the top k by log-weight + Gumbel noise" (the Gumbel-max
    trick), which Spark executes as one TakeOrderedAndProject: per-partition
    heaps, no global sort, no RNG.

    Output: (id, n_tokens, log_weight, score) — the k selected docs, score
    descending. The Gumbel perturbation is snapped to integer microunits and
    added to the (already-micro) weight sum, so the selection order is a
    total integer order (ties broken by id) that a SQL oracle replays
    exactly."""
    w = dsir_log_weights(docs, target_col, text_col, id_col, buckets, alpha)
    g_micro = F.floor(gumbel_noise(F.col("id")) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    scored = w.select(
        "id",
        "n_tokens",
        "log_weight",
        (
            (F.floor(F.col("log_weight") * F.lit(1e6) + F.lit(0.5)).cast("long") + g_micro)
            / F.lit(1e6)
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), "id").limit(k)


# ---------------------------------------------------------------------------
# corpus.Pipeline (round 9, VERDICT r8 #6): the user-facing composable
# surface over the gated corpus-prep operators. pipeline_training_data_v2
# proved the stages COMPOSE (one plan, one end-to-end oracle); this is the
# product shape a caller wires them with — each stage factory validates its
# config at CONSTRUCTION time against the same planners/guards the
# operators use (lsh_params_for's S-curve for near-dedup thresholds, the
# stride<=window chunking rule, shard/seed sanity), so a bad config fails
# before any cluster time is spent. Pipeline.run is a pure plan fold: no
# stage materializes, the composed job stays one lazy DataFrame.
#
# Frame contract: stages consume and produce a DOCUMENT frame with at
# least (id_col, text_col); metadata columns pass through stages that
# filter rows and are dropped by stages that rebuild text or re-key
# (span_removal, chunk), which is each underlying operator's documented
# behavior. chunk re-keys rows to chunk_key = doc_id * key_mult +
# chunk_id; shuffle_shard appends (skey, shard, pos) and must come last.
# ---------------------------------------------------------------------------


class Stage:
    """One named pipeline step: ``apply(docs) -> docs``. Construct via the
    ``stage_*`` factories, which validate configs eagerly."""

    def __init__(self, name: str, fn, terminal: bool = False):
        self.name = name
        self._fn = fn
        self.terminal = terminal

    def apply(self, docs: DataFrame) -> DataFrame:
        return self._fn(docs)

    def __repr__(self) -> str:  # pragma: no cover - debug nicety
        return f"Stage({self.name!r})"


def stage_bigram_quality_gate(
    max_avg_nll: float,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
) -> Stage:
    """Keep documents whose mean bigram surprise (text.bigram_lm_scores,
    snap_micros — the oracle-replayable mode) is <= max_avg_nll nats.

    UNSCORED docs (fewer than two tokens — the LM emits no score for them)
    follow an EXPLICIT policy (ADVICE r9): the default ``keep_unscored=
    False`` DROPS them (a doc too short to score is below any quality bar
    this gate can certify — and the historical/oracle-pinned behavior);
    ``keep_unscored=True`` retains them via a left join, for corpora where
    single-token docs are legitimate payloads."""
    if max_avg_nll <= 0:
        raise ValueError(f"max_avg_nll must be positive, got {max_avg_nll}")

    def fn(docs: DataFrame) -> DataFrame:
        from payroll_etl_fastapi_spark.operators import text as T

        lm = T.bigram_lm_scores(docs, text_col, id_col, alpha=alpha, snap_micros=True)
        if keep_unscored:
            scores = lm.select(
                F.col("id").alias(id_col),
                F.col("avg_neg_log_prob").alias("__nll"),
            )
            return (
                docs.join(scores, id_col, "left")
                .filter(F.col("__nll").isNull() | (F.col("__nll") <= max_avg_nll))
                .drop("__nll")
            )
        keep = lm.filter(F.col("avg_neg_log_prob") <= max_avg_nll).select(
            F.col("id").alias(id_col)
        )
        return docs.join(keep, id_col)

    return Stage(f"bigram_quality_gate(<={max_avg_nll})", fn)


def stage_language_gate(langs: list[str], lang_col: str = "lang") -> Stage:
    """Keep documents whose language column is in the allowlist."""
    if not langs:
        raise ValueError("langs allowlist must be non-empty")
    return Stage(
        f"language_gate({sorted(langs)})",
        lambda docs: docs.filter(F.col(lang_col).isin(*langs)),
    )


def stage_exact_dedup(text_col: str = "text", id_col: str = "doc_id") -> Stage:
    """Exact dedup on the md5 of whitespace-normalized text, keep-lowest-id
    (the pipeline_training_data rule)."""
    from pyspark.sql import Window as W

    def fn(docs: DataFrame) -> DataFrame:
        from payroll_etl_fastapi_spark.operators.text import normalize_text

        fp = F.md5(normalize_text(F.col(text_col)))
        w = W.partitionBy(fp).orderBy(id_col)
        return (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    return Stage("exact_dedup", fn)


def stage_near_dedup(
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> Stage:
    """MinHash-LSH near-dedup at a measured-recall threshold, keep-lowest-id.
    The band structure derives from dedup.lsh_params_for's S-curve AT
    CONSTRUCTION — an unreachable threshold raises here, not mid-job."""
    from payroll_etl_fastapi_spark.operators.dedup import lsh_params_for

    lsh_params_for(threshold)  # eager validation; apply re-derives via threshold=

    def fn(docs: DataFrame) -> DataFrame:
        from payroll_etl_fastapi_spark.operators.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            docs.select(id_col, text_col), text_col, id_col, n=n, threshold=threshold
        )
        drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        return docs.join(drop, id_col, "left_anti")

    return Stage(f"near_dedup(j>={threshold})", fn)


# Self-join junk budget for the semantic-dedup LSH dispatch: the fraction
# of UNCORRELATED pairs (cosine ~0, the bulk of any real corpus) the
# banding may admit as candidates. Retrieval bandings tolerate ~0.2 per
# QUERY row; in an n x n SELF-join the same number multiplies n^2/2 —
# measured round 11: the 32/8 retrieval banding admitted 81% of random
# pairs and the facade gate went quadratic at sf1. 0.02 keeps the verify
# mass at 1-3% of pairs (9-bit bands at threshold 0.9).
_SELF_JOIN_JUNK = 0.02


def dedup_lsh_banding(
    threshold: float, multiprobe: bool = False
) -> tuple[int, int, int]:
    """(num_planes, bands, probe_flips) for the semantic-dedup SELF-join
    at a cosine ``threshold`` — similarity.lsh_planes_for with the
    self-join junk budget instead of the retrieval one. The multiprobe
    variant stores HALF the bands (half the index rows — the family's
    value proposition) and recovers recall with 2 probe-side bit flips
    per band; both shapes' pair recall is measured and committed
    (tools/semdedup_quality.py → semantic_dedup_pair_floors)."""
    from payroll_etl_fastapi_spark.operators.similarity import lsh_planes_for

    num_planes, bands = lsh_planes_for(
        threshold, max_fp_weight=_SELF_JOIN_JUNK
    )
    if not multiprobe:
        return num_planes, bands, 0
    bits = num_planes // bands
    half = max(1, (bands + 1) // 2)
    return bits * half, half, 2


def stage_semantic_dedup(
    embeddings: DataFrame,
    threshold: float,
    target_recall: float = 0.85,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> Stage:
    """Embedding-space near-dedup routed through the ANN planner (VERDICT
    r9 #5) — the facade's semantic path under the same measured-contract
    discipline as stage_near_dedup's MinHash path: ``target_recall`` runs
    through ``similarity.ann_plan(metric="cosine")`` AT CONSTRUCTION, so an
    ask above the committed frontier raises here (naming the ceiling), not
    mid-job, and the picked config is the committed floor's config, never a
    hand-tuned knob.

    Dispatch mirrors ann_topk, re-expressed in the DEDUP shape (a banded /
    clustered SELF-join — never the retrieval path, whose broadcast-query
    contract would broadcast the corpus):
    - lsh / lsh_multiprobe → embedding_near_dup_pairs under the
      THRESHOLD-DERIVED self-join banding (dedup_lsh_banding below; the
      multiprobe family halves the stored bands and recovers recall with
      probe-side flips); exact cosine >= threshold verifies candidates;
      drop the higher id.
    - ivf / ivf_kmeans → SemDeDup within-cluster dedup (semantic_dedup)
      under the picked coarse quantizer (lowest-id sample / trained
      k-means, exactly as the routed retrieval trains them).
    The committed floors are measured PAIR recall in the dispatched dedup
    shape itself (VERDICT r10 #4: tools/semdedup_quality.py planted-twin
    harness → semantic_dedup_pair_floors in tools/quality_baseline.json;
    ann_plan(shape="dedup") qualifies against those, never the retrieval
    recall@10 numbers), so target_recall here means "fraction of true
    near-dup pairs at cosine >= threshold the dispatch catches".

    Docs whose id has no embedding row are KEPT (nothing to compare);
    embeddings without a matching doc are ignored."""
    from payroll_etl_fastapi_spark.operators import similarity as S

    plan = S.ann_plan(target_recall, dim=dim, metric="cosine", shape="dedup")
    fam = plan["family"]
    if fam in ("lsh", "lsh_multiprobe"):
        # derive the banding AT CONSTRUCTION so an unreachable threshold
        # raises here, like stage_near_dedup's lsh_params_for discipline
        num_planes, bands, flips = dedup_lsh_banding(
            threshold, multiprobe=(fam == "lsh_multiprobe")
        )

    def fn(docs: DataFrame) -> DataFrame:
        emb = embeddings.select(
            F.col(emb_id_col).alias("__sid"), F.col(vec_col).alias("__v")
        ).join(
            docs.select(F.col(id_col).alias("__sid")), "__sid"
        )
        prm = plan["params"]
        if fam in ("lsh", "lsh_multiprobe"):
            pairs = S.embedding_near_dup_pairs(
                emb,
                threshold,
                id_col="__sid",
                vec_col="__v",
                dim=dim,
                num_planes=num_planes,
                bands=bands,
                n_probe_flips=flips,
            )
            drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
        elif fam in ("ivf", "ivf_kmeans"):
            # Seed rows double as the empty/undersized guard (ADVICE r10):
            # no doc has an embedding -> nothing to compare, return docs
            # unchanged instead of IndexError-ing on centroids[0]; fewer
            # rows than n_centroids -> clamp the quantizer to the rows that
            # exist (a limit(k).collect() is an early-stop scan, so the
            # guard costs no extra corpus pass).
            seed_rows = (
                emb.orderBy("__sid").limit(prm["n_centroids"]).collect()
            )
            if not seed_rows:
                return docs
            if fam == "ivf_kmeans":
                kcents = S.train_centroids_kmeans(
                    emb,
                    n_centroids=min(prm["n_centroids"], len(seed_rows)),
                    n_iters=prm["n_iters"],
                    id_col="__sid",
                    vec_col="__v",
                )
                cents = [v for _, v in kcents]
            else:
                cents = [list(r["__v"]) for r in seed_rows]
            verdicts = S.semantic_dedup(
                emb, cents, threshold, id_col="__sid", vec_col="__v"
            )
            drop = verdicts.filter(F.col("is_dropped") == 1).select(
                F.col("id").alias(id_col)
            )
        else:  # pragma: no cover - cosine frontier holds only these families
            raise ValueError(
                f"stage_semantic_dedup cannot dispatch family {fam!r}"
            )
        return docs.join(drop, id_col, "left_anti")

    return Stage(
        f"semantic_dedup(cos>={threshold}@{plan['family']})", fn
    )


def stage_decontaminate(
    bench: DataFrame,
    max_overlap_bp: int = 8000,
    shingle_n: int = 5,
    min_common: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> Stage:
    """Drop corpus documents whose shingle overlap with any benchmark item
    reaches max_overlap_bp basis points of that item's shingles (the
    corpus_contamination rule; the benchmark side broadcasts)."""
    if not 0 < max_overlap_bp <= 10000:
        raise ValueError(f"max_overlap_bp must be in (0, 10000], got {max_overlap_bp}")

    def fn(docs: DataFrame) -> DataFrame:
        from payroll_etl_fastapi_spark.operators import dedup as D

        corpus_sh = D.shingles(docs, text_col, id_col, n=shingle_n).withColumnRenamed(
            "id", id_col
        )
        bench_sh = D.shingles(
            bench, bench_text_col, bench_id_col, n=shingle_n
        ).withColumnRenamed("id", bench_id_col)
        bn = bench_sh.groupBy(bench_id_col).agg(
            F.count(F.lit(1)).alias("__n_bench")
        )
        flagged = (
            corpus_sh.join(F.broadcast(bench_sh), "shingle")
            .groupBy(id_col, bench_id_col)
            .agg(F.count(F.lit(1)).alias("__n_common"))
            .filter(F.col("__n_common") >= min_common)
            .join(F.broadcast(bn), bench_id_col)
            .filter(
                F.expr("CAST((__n_common * 10000) div __n_bench AS BIGINT)")
                >= max_overlap_bp
            )
            .select(id_col)
            .distinct()
        )
        return docs.join(flagged, id_col, "left_anti")

    return Stage(f"decontaminate(>={max_overlap_bp}bp)", fn)


def stage_span_removal(
    span_tokens: int = 8,
    keep_first: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Stage:
    """Cut cross-document duplicated spans (dedup.remove_duplicate_spans);
    rebuilds text, so metadata columns do not pass through."""
    if span_tokens < 2:
        raise ValueError(f"span_tokens must be >= 2, got {span_tokens}")

    def fn(docs: DataFrame) -> DataFrame:
        from payroll_etl_fastapi_spark.operators.dedup import remove_duplicate_spans

        out = remove_duplicate_spans(
            docs, text_col, id_col, span_tokens=span_tokens, keep_first=keep_first
        )
        return out.select(
            F.col("id").alias(id_col), F.col("text_clean").alias(text_col)
        )

    return Stage(f"span_removal(w={span_tokens})", fn)


def stage_pii_scrub(text_col: str = "text") -> Stage:
    """Redact emails/phones in place (corpus.scrub_pii) — a pure projection
    stage; all other columns pass through."""

    def fn(docs: DataFrame) -> DataFrame:
        return docs.withColumn(text_col, scrub_pii(F.col(text_col)))

    return Stage("pii_scrub", fn)


def stage_stratified_sample(
    rates_per_mille: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> Stage:
    """Deterministic stratified keep-filter (corpus.stratified_sample):
    content-hash sampling on the id, reproducible under repartitioning;
    strata without a configured rate drop entirely."""
    if not rates_per_mille:
        raise ValueError("rates_per_mille must be non-empty")
    bad = {k: v for k, v in rates_per_mille.items() if not 0 <= int(v) <= 1000}
    if bad:
        raise ValueError(f"rates are per-mille (0..1000); bad entries: {bad}")

    def fn(docs: DataFrame) -> DataFrame:
        keep = stratified_sample(
            F.col(id_col).cast("string"), rates_per_mille, stratum_col
        )
        return docs.filter(keep)

    return Stage(f"stratified_sample({sorted(rates_per_mille)})", fn)


def stage_chunk(
    chunk_tokens: int = 64,
    stride: int = 48,
    key_mult: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Stage:
    """Overlapping-window chunking (corpus.chunk_documents); re-keys rows to
    chunk_key = doc_id * key_mult + chunk_id and carries (text, n_tokens).
    The stride<=window rule is enforced here, at construction; a document
    yielding chunk_id >= key_mult raises at execution (raise_error naming
    the doc) instead of silently colliding into another document's key
    space (ADVICE r9 — downstream dedup/shard stages key on this id)."""
    w, s = int(chunk_tokens), int(stride)
    if w <= 0 or s <= 0 or s > w:
        raise ValueError(
            f"need 0 < stride ({s}) <= chunk_tokens ({w}): chunks are "
            "overlapping-or-adjacent windows"
        )
    if key_mult < 2:
        raise ValueError(f"key_mult must be >= 2, got {key_mult}")

    def fn(docs: DataFrame) -> DataFrame:
        out = chunk_documents(
            docs, chunk_tokens=w, stride=s, text_col=text_col, id_col=id_col
        )
        key = F.when(
            F.col("chunk_id") >= key_mult,
            F.expr(
                "raise_error(concat('stage_chunk: document ', "
                "CAST(id AS STRING), ' yields chunk_id ', "
                "CAST(chunk_id AS STRING), "
                f"' >= key_mult {key_mult} — chunk keys would collide "
                "across documents; raise key_mult'))"
            ).cast("long"),
        ).otherwise(F.col("id") * key_mult + F.col("chunk_id"))
        return out.select(
            key.alias(id_col),
            F.col("chunk_text").alias(text_col),
            "n_tokens",
        )

    return Stage(f"chunk({w}/{s})", fn)


def stage_weighted_sample(
    n: int,
    weight_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
) -> Stage:
    """Keep the ``n`` documents a deterministic weighted draw (∝
    ``weight_col``, without replacement — corpus.weighted_sample's
    exponential race over hash-derived uniforms) selects. The weighted
    complement of stage_stratified-style rate sampling: "keep the best N
    by quality weight, proportionally" instead of "keep a fixed rate per
    stratum". n is validated at construction; the weight contract
    (w=0/NULL never sampled, negative w raises in-plan) is the
    operator's."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def fn(docs: DataFrame) -> DataFrame:
        picked = weighted_sample(docs, n, F.col(weight_col), id_col, seed).select(
            F.col("id").alias(id_col)
        )
        return docs.join(picked, id_col, "left_semi")

    return Stage(f"weighted_sample(n={n}@{seed})", fn)


def stage_shuffle_shard(
    n_shards: int, seed: int = 0, id_col: str = "doc_id"
) -> Stage:
    """Deterministic shuffle-shard layout (corpus.shuffle_shards) joined
    back onto the payload: appends (skey, shard, pos). Terminal — the
    output is a training-export layout, not a document frame."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    def fn(docs: DataFrame) -> DataFrame:
        layout = shuffle_shards(docs, n_shards, seed, id_col).withColumnRenamed(
            "id", id_col
        )
        return docs.join(layout, id_col)

    return Stage(f"shuffle_shard({n_shards}@{seed})", fn, terminal=True)


class Pipeline:
    """Composable corpus-preparation pipeline: ``Pipeline([...stages]).
    run(docs)`` folds the stages into one lazy composition — nothing
    executes until the caller acts on the result — with a LAZY local
    checkpoint at each stage boundary (round 11): several stages consume
    their input document frame more than once (stage_semantic_dedup joins
    it to the embeddings AND anti-joins the drop list back onto it;
    stage_shuffle_shard joins the layout back onto the payload), and
    without the boundary checkpoint every such consumer re-executes the
    entire upstream pipeline — measured 31.5 s -> ~13 s on the
    pipeline_facade_v3 gate at sf0.1, where the MinHash stage alone was
    re-running four times. eager=False keeps construction free: each
    boundary materializes once at the first downstream action and is
    freed by the context cleaner when unreachable (the
    embedding_near_dup_pairs discipline). Results are value-identical —
    the facade-vs-hand-wired hash-equality pytests pin that.

    Construction validates the composition: at most one terminal stage
    (shuffle_shard), and only in final position."""

    def __init__(self, stages: list[Stage]):
        if not stages:
            raise ValueError("Pipeline needs at least one stage")
        bad = [s for s in stages if not isinstance(s, Stage)]
        if bad:
            raise TypeError(f"not Stage instances: {bad!r} — use the stage_* factories")
        for i, s in enumerate(stages[:-1]):
            if s.terminal:
                raise ValueError(
                    f"terminal stage {s.name!r} at position {i} must come last"
                )
        self.stages = list(stages)

    def run(self, docs: DataFrame) -> DataFrame:
        out = docs
        for s in self.stages:
            out = s.apply(out)
            if not s.terminal:
                # a terminal stage's output (the training-export layout) is
                # read once by the caller — a boundary there would only pay
                # another toRdd planning pass for nothing. (Round 12: a
                # blanket floor_parallelism at every boundary was measured a
                # 2x REGRESSION — the per-boundary round-robin exchange
                # re-executes per downstream consumer; the CPU-bound stage
                # kernels instead floor themselves at their own scans, which
                # the LogicalRDD floor now reaches through this checkpoint.)
                out = out.localCheckpoint(eager=False)
        return out

    def describe(self) -> list[str]:
        return [s.name for s in self.stages]
