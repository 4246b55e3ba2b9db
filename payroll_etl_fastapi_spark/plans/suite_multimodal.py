"""Multimodal queries for the driver gate: binary-payload plumbing over a
media table forged from documents (UTF-8 bytes as payload — the container has
no codec libraries, see operators/multimodal.py).

The feature query runs the REAL mapInPandas path (Arrow batches → Python →
sha256-derived fake features) and the oracle replays the identical bytes →
sha256 → scaled-int pipeline in SQL, so the plumbing is correctness-gated,
not just smoke-tested. Divisions are by 2^32 (exact scaling), so the doubles
are bit-identical before the 1e-6 snap."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import multimodal as MM
from payroll_etl_fastapi_spark.plans.suite import _r6, _sql_r6, _t, query

import itertools

_WL_COUNTER = itertools.count()  # unique memory-sink name per invocation


@query(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id                                  AS media_id,
           octet_length(encode(text))              AS n_bytes,
           substr(sha256(text), 1, 16)             AS sha16,
           {_sql_r6("CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) / 4294967296.0")} AS f0,
           {_sql_r6("CAST(('0x' || substr(sha256(text), 57, 8)) AS BIGINT) / 4294967296.0")} AS f7
    FROM documents
    ORDER BY media_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → feature extraction through the real mapInPandas path
    (operators.multimodal.extract_features); the oracle replays the same
    sha256-derived fake decode byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    feats = MM.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "sha16",
        _r6(F.col("features")[0]).alias("f0"),
        _r6(F.col("features")[7]).alias("f7"),
    ).orderBy("media_id")


_CDC_ORACLE = """
    WITH pay AS (
      SELECT doc_id AS media_id, octet_length(encode(text)) AS n,
             lower(hex(encode(text))) AS hx
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    bytes AS (
      SELECT media_id, n, i.i AS i,
             CAST(('0x' || substr(hx, 2*i.i + 1, 2)) AS BIGINT) AS v,
             substr(hx, 2*i.i + 1, 2) AS hv
      FROM pay, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i
    ),
    win AS (
      SELECT media_id, i, hv,
             lag(v, 3) OVER w AS v3, lag(v, 2) OVER w AS v2,
             lag(v, 1) OVER w AS v1, v
      FROM bytes WINDOW w AS (PARTITION BY media_id ORDER BY i)
    ),
    anch AS (
      SELECT media_id, i, hv,
             CASE WHEN i >= 3
                       AND ((CAST(v3*16777216 + v2*65536 + v1*256 + v AS HUGEINT)
                             * 2654435761) % 4294967296) // 67108864 = 0
                  THEN 1 ELSE 0 END AS is_anchor
      FROM win
    ),
    cid AS (
      SELECT media_id, i, hv,
             COALESCE(SUM(is_anchor) OVER (
               PARTITION BY media_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
      FROM anch
    ),
    chunks AS (
      SELECT media_id, chunk_id, md5(string_agg(hv, '' ORDER BY i)) AS digest
      FROM cid GROUP BY media_id, chunk_id
    ),
    dset AS (SELECT DISTINCT media_id, digest FROM chunks),
    dfreq AS (SELECT digest FROM dset GROUP BY digest HAVING count(*) <= 50),
    capped AS (SELECT media_id, digest FROM dset SEMI JOIN dfreq USING (digest)),
    sizes AS (SELECT media_id, count(*) AS nd FROM capped GROUP BY media_id),
    cand AS (
      SELECT x.media_id AS id_a, y.media_id AS id_b, count(*) AS shared
      FROM capped x JOIN capped y USING (digest)
      WHERE x.media_id < y.media_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared, a.nd AS na, b.nd AS nb,
           CAST((10000 * shared) // (a.nd + b.nd - shared) AS BIGINT) AS jaccard_bp
    FROM cand JOIN sizes a ON id_a = a.media_id JOIN sizes b ON id_b = b.media_id
    WHERE (10000 * shared) // (a.nd + b.nd - shared) >= 5000
    ORDER BY jaccard_bp DESC, id_a, id_b
"""


@query("multimodal_cdc_neardup", oracle=_CDC_ORACLE)
def multimodal_cdc_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary near-dup detection via content-defined chunking: payloads →
    rolling-hash-anchored chunks (mapInPandas decode stage) → Jaccard over
    the df-capped chunk-digest sets via ONE equality join on digest.

    The shift-robust multimodal dedup primitive: position-based hashes
    (aHash chunk means) scramble after one early insertion, while CDC
    boundaries re-align within one 4-byte window — so edited copies of
    the same payload still share every untouched chunk. The oracle
    replays boundary detection, chunk digests, the df cap, and the
    integer Jaccard exactly (hex-string md5 on both sides)."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.media_from_documents(docs)
    digests = MM.cdc_chunk_digests(media, mask_bits=6)
    pairs = MM.cdc_neardup_pairs(digests, max_df=50, min_jaccard_bp=5000)
    return pairs.orderBy(F.desc("jaccard_bp"), "id_a", "id_b")


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT source,
           count(*)                         AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text))        AS distinct_payloads,
           max(octet_length(encode(text)))  AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup over binary payloads — stays entirely JVM-side
    (md5/length on binary columns); at scale this is the query shape that
    must NOT read pixel data, only the payload column's stats/metadata."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        docs.select(
            "source",
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_md5").alias("distinct_payloads"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("source")
    )


def _warclite_shards(spark: SparkSession, sf_dir: str) -> str:
    """Per-sf_dir memoized warclite shard corpus (8 shards of the documents
    table) — the INPUT both warclite gates read; writing it once per process
    instead of once per gate call removes duplicated scaffolding from the
    bench (VERDICT r6 #7). The directory lives until interpreter exit."""
    import atexit
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.plans.suite import fixture
    from payroll_etl_fastapi_spark.sources import warclite as WL

    def build() -> str:
        scratch = tempfile.mkdtemp(prefix="spark_warclite_fixture_")
        atexit.register(shutil.rmtree, scratch, ignore_errors=True)
        docs = _t(spark, sf_dir, "documents")
        WL.write_corpus(
            docs.select(
                "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
            ).repartition(8),
            scratch,
            "doc_id",
            "payload",
        )
        return scratch

    return fixture(sf_dir, "warclite_shards", build)


@query(
    "warclite_scan",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                           AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT)    AS total_bytes,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 7)) AS BIGINT))
                AS BIGINT)                                    AS payload_checksum,
           CAST(min(doc_id) AS BIGINT)                        AS min_id,
           CAST(max(doc_id) AS BIGINT)                        AS max_id
    FROM documents
    """,
)
def warclite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom binary container (sources/warclite.py, Spark 4
    Python Data Source API): the documents table is written as
    length-prefixed warclite shards (one per partition, executor-side
    mapInPandas sink — payload bytes never touch the driver), scanned back
    through ``spark.read.format("warclite")`` (one InputPartition per
    shard, driver does directory listing only), and reduced to exact
    integer aggregates + the family-standard order-free 28-bit md5
    checksum. The oracle replays the same numbers straight from the
    documents table, so one dropped/duplicated/corrupted record anywhere
    in the frame-parse path flips the hash. The shard corpus is memoized
    per sf_dir (suite.fixture, VERDICT r6 #7) — writing it is input
    scaffolding; the container SCAN is the operator under test and stays
    fully timed."""
    from payroll_etl_fastapi_spark.sources import warclite as WL

    shards = _warclite_shards(spark, sf_dir)
    WL.register(spark)
    scanned = spark.read.format("warclite").load(shards)
    checksum = F.conv(
        F.substring(F.md5(F.col("payload")), 1, 7), 16, 10
    ).cast("long")
    return scanned.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.sum(checksum).cast("long").alias("payload_checksum"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
    )


@query(
    "warclite_stream_rollup",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                        AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 7)) AS BIGINT))
                AS BIGINT)                                 AS payload_checksum
    FROM documents
    """,
)
def warclite_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom container consumed as a STREAM: the same warclite shards
    read through the source's SimpleDataSourceStreamReader (offset =
    consumed-shard count, committed via the engine checkpoint — a restart
    resumes at the acknowledged shard; pinned by
    test_warclite_stream_tails_new_shards_exactly_once), rolled up in
    complete mode and drained. Micro-batch boundaries cannot move exact
    integer aggregates, so the oracle is the same one SQL statement as the
    batch twin — hash-identical whether records arrive as one batch or
    shard by shard. Reads the per-sf_dir memoized shard corpus (input
    scaffolding, VERDICT r6 #7); the checkpoint stays per-call so every
    run drains the stream from scratch."""
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.sources import warclite as WL

    shards = _warclite_shards(spark, sf_dir)
    scratch = tempfile.mkdtemp(prefix="spark_warclite_stream_gate_")
    try:
        WL.register(spark)
        stream = (
            spark.readStream.format("warclite")
            .option("path", shards)
            .load()
        )
        checksum = F.conv(
            F.substring(F.md5(F.col("payload")), 1, 7), 16, 10
        ).cast("long")
        rolled = stream.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
            F.sum(checksum).cast("long").alias("payload_checksum"),
        )
        name = f"t_gate_warclite_{next(_WL_COUNTER)}"
        q = (
            rolled.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", scratch + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)



# ---------------------------------------------------------------------------
# perceptual near-dup (round 9, VERDICT r8 #7): dHash + Hamming bands
# ---------------------------------------------------------------------------

_DH_COPY_OFFSET = 5_000_000
_DH_MAX_HAMMING = 6

# oracle pixel lookup: the synthesized payload is pure-ASCII, so byte k of
# the UTF-8 payload == ord() of character k+1 — the oracle replays the
# operator's hex-byte indexing on the string directly. Index math is the
# operator's at w0 = h0 = 16: src_r = (r*16)//8, src_c = (c*16)//9.
_DH_PX = "ord(substr(s, (((b // 8) * 16) // 8) * 16 + (((b % 8) + {ofs}) * 16) // 9 + 1, 1))"

_DHASH_ORACLE = f"""
    WITH src AS (
        SELECT doc_id AS id,
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS c
        FROM documents
    ),
    base AS (
        SELECT id, substr(repeat(c, 256 // length(c) + 1), 1, 256) AS s
        FROM src WHERE length(c) >= 32
    ),
    imgs AS (
        SELECT id, s FROM base
        UNION ALL
        SELECT id + {_DH_COPY_OFFSET}, 'qqq' || substr(s, 4)
        FROM base WHERE id % 4 = 0
    ),
    bits AS (
        SELECT id, list_transform(generate_series(0, 63), b ->
            CASE WHEN {_DH_PX.format(ofs=0)} < {_DH_PX.format(ofs=1)}
                 THEN 1 ELSE 0 END) AS bt
        FROM imgs
    ),
    bands AS (
        SELECT id, t.j AS band,
               list_reduce(list_slice(bt, t.j * 16 + 1, t.j * 16 + 16),
                           (a, x) -> a * 2 + x) AS sig
        FROM bits, unnest(generate_series(0, 3)) AS t(j)
    ),
    cand AS (
        SELECT DISTINCT x.id AS id_a, y.id AS id_b
        FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
        WHERE x.id < y.id
    ),
    bl AS (SELECT id, list(sig ORDER BY band) AS v FROM bands GROUP BY id)
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(a.v[1], b.v[1])) + bit_count(xor(a.v[2], b.v[2]))
              + bit_count(xor(a.v[3], b.v[3])) + bit_count(xor(a.v[4], b.v[4]))
              AS BIGINT) AS hamming
    FROM cand c JOIN bl a ON c.id_a = a.id JOIN bl b ON c.id_b = b.id
    WHERE bit_count(xor(a.v[1], b.v[1])) + bit_count(xor(a.v[2], b.v[2]))
        + bit_count(xor(a.v[3], b.v[3])) + bit_count(xor(a.v[4], b.v[4]))
        <= {_DH_MAX_HAMMING}
    ORDER BY id_a, id_b
    """


@query("multimodal_dhash_neardup", oracle=_DHASH_ORACLE)
def multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection (operators.multimodal.
    dhash_neardup_pairs, round 9): dHash-style 64-bit difference
    fingerprints over RAW_GRAY8 images — invariant under exact
    nearest-neighbor rescales that change every byte (pytest-pinned) —
    with Hamming-banded candidate generation (four 16-bit bands, equality
    join, never all-pairs) and exact bit_count verification at
    {_DH_MAX_HAMMING} bits. The gate forges deterministic 16x16 images
    from document text (pure-ASCII repeat-fill; the codec step is the
    documented swappable part) and plants 3-byte-perturbed copies of every
    4th doc: each copy lands within a few bits of its original while
    unrelated images stay far. All integer ops end to end — the oracle
    replays the byte sampling, the 64 comparisons, the MSB band folds,
    the band join, and the xor/bit_count verify."""
    docs = _t(spark, sf_dir, "documents")
    clean = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", "")
    base = (
        docs.select(F.col("doc_id").alias("id"), clean.alias("c"))
        .filter(F.length("c") >= 32)
        .select(
            "id",
            F.expr(
                "substring(repeat(c, CAST(256 div length(c) AS INT) + 1), 1, 256)"
            ).alias("s"),
        )
    )
    copies = base.filter(F.col("id") % 4 == 0).select(
        (F.col("id") + _DH_COPY_OFFSET).alias("id"),
        F.expr("concat('qqq', substring(s, 4))").alias("s"),
    )
    # checkpoint the forged INPUT before fingerprinting: the dhash
    # projection has 512 byte-probe leaves, and CollapseProject would
    # inline the repeat/concat string pipeline into every one of them —
    # the optimizer then chews minutes on a ~25k-node expression tree
    # (real media tables read payload as a plain parquet column and never
    # hit this; it is an artifact of synthesizing the corpus in-plan)
    imgs = base.unionByName(copies).localCheckpoint(eager=False)
    media = imgs.select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("s", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/x-raw-gray8").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    return MM.dhash_neardup_pairs(media, max_hamming=_DH_MAX_HAMMING).orderBy(
        "id_a", "id_b"
    )
