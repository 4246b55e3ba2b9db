"""Unit tests for operators/multimodal.py: mapInPandas plumbing — schemas,
fan-out shapes, determinism — with the stubbed decode."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from payroll_etl_fastapi_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", bytearray(b"x" * 40), ("image/png", 4, 4, None)),
        (2, "video", bytearray(b"frame-a-00frame-b-09frame-c-31frame-d-42"), ("video/mp4", 8, 8, 4000)),
        (3, "audio", bytearray(b""), ("audio/wav", None, None, 1000)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_matches_hashlib(media_df):
    got = {r.media_id: r for r in MM.extract_features(media_df).collect()}
    assert set(got) == {1, 2, 3}
    payload = b"x" * 40
    assert got[1].n_bytes == 40
    assert got[1].sha16 == hashlib.sha256(payload).hexdigest()[:16]
    assert got[1].features == MM._fake_decode_features(payload)
    assert len(got[1].features) == MM._FEATURE_DIM
    assert all(0.0 <= f < 1.0 for f in got[1].features)
    assert got[3].n_bytes == 0  # empty payload flows through, no crash


def test_sample_frames_fanout(media_df):
    frames = MM.sample_frames(media_df, every_n=2, max_frames=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    # media 2: 40+ bytes → 16-byte frames 0,1,2 → every 2nd → frames 0 and 2
    assert [r.frame_idx for r in sorted(by_media[2], key=lambda r: r.frame_idx)] == [0, 1]
    # media 3 (empty) produces no frames
    assert 3 not in by_media


def test_resize_nearest_neighbor_matches_numpy(spark):
    """RAW_GRAY8 resize: real pixel math, checked against a plain-numpy
    reference on a 6x4 gradient image downsampled to 3x2."""
    import numpy as np

    w0, h0 = 6, 4
    img = np.arange(w0 * h0, dtype=np.uint8).reshape(h0, w0)
    media = spark.createDataFrame(
        [(1, "image", bytearray(img.tobytes()), ("raw/gray8", w0, h0, None))],
        MM.MEDIA_SCHEMA,
    )
    out = MM.resize_images(media, 3, 2)
    assert out.schema == media.schema  # contract: same schema out
    row = out.first()
    assert (row.meta.width, row.meta.height) == (3, 2)
    yi = (np.arange(2) * h0) // 2
    xi = (np.arange(3) * w0) // 3
    assert bytes(row.payload) == img[np.ix_(yi, xi)].tobytes()


def test_resize_poisons_undecodable_rows(spark):
    """Null payloads, missing dims, or contradictory lengths pass through
    with payload=NULL instead of killing the task."""
    rows = [
        (1, "image", bytearray(b"x" * 12), ("raw/gray8", 4, 3, None)),   # valid
        (2, "image", bytearray(b"x" * 5), ("raw/gray8", 4, 3, None)),    # wrong len
        (3, "image", None, ("raw/gray8", 4, 3, None)),                    # null payload
        (4, "image", bytearray(b"x" * 12), ("raw/gray8", None, None, None)),  # no dims
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.resize_images(media, 2, 2).collect()}
    assert got[1].payload is not None and len(got[1].payload) == 4
    assert got[2].payload is None and got[2].meta.width == 4
    assert got[3].payload is None
    assert got[4].payload is None


def test_media_from_documents_schema(spark):
    docs = spark.createDataFrame([(7, "hello")], "doc_id long, text string")
    media = MM.media_from_documents(docs)
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    row = media.first()
    assert bytes(row.payload) == b"hello"
    assert row.meta.mime == "application/octet-stream"


def test_null_payload_flows_through(spark):
    rows = [(9, "image", None, ("image/png", None, None, None))]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    feats = MM.extract_features(df).collect()
    assert feats[0].n_bytes == 0  # null payload treated as empty, no crash
    assert MM.sample_frames(df).count() == 0


def test_resize_passes_non_image_rows_untouched(spark):
    rows = [
        (1, "image", bytearray(b"x" * 12), ("raw/gray8", 4, 3, None)),
        (2, "audio", bytearray(b"y" * 12), ("audio/pcm", None, None, 1000)),
        (3, "video", bytearray(b"z" * 12), ("video/raw", 4, 3, 2000)),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r.media_id: r for r in MM.resize_images(media, 2, 2).collect()}
    assert len(got[1].payload) == 4 and got[1].meta.width == 2
    # audio/video payloads and meta come through byte-identical — even the
    # video whose len(payload) == width*height must NOT be "resized"
    assert bytes(got[2].payload) == b"y" * 12 and got[2].meta.duration_ms == 1000
    assert bytes(got[3].payload) == b"z" * 12 and got[3].meta.width == 4


def _cdc_digests_py(p: bytes) -> set[str]:
    """Exact python replica of cdc_chunk_digests for one payload."""
    import numpy as np

    n = len(p)
    if n == 0:
        return set()
    a = np.frombuffer(p, np.uint8)
    cut: list[int] = []
    if n >= 4:
        u = a.astype(np.uint64)
        w = (
            (u[:-3] << np.uint64(24))
            | (u[1:-2] << np.uint64(16))
            | (u[2:-1] << np.uint64(8))
            | u[3:]
        )
        anchor = ((w * np.uint64(2654435761)) % np.uint64(2**32)) >> np.uint64(26) == 0
        cut = (np.nonzero(anchor)[0] + 4).tolist()
        if cut and cut[-1] == n:
            cut = cut[:-1]
    import numpy as np2

    return {
        hashlib.md5(bytes(q).hex().encode()).hexdigest() for q in np2.split(a, cut)
    }


def _media(spark, payloads: dict[int, bytes]):
    rows = [
        (mid, "image", bytearray(p), ("application/octet-stream", None, None, None))
        for mid, p in payloads.items()
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_cdc_chunk_digests_match_python_replica(spark):
    import random

    rng = random.Random(7)
    payloads = {
        1: bytes(rng.randrange(256) for _ in range(500)),
        2: b"abc",  # n < 4: single whole-payload chunk
        3: b"",  # empty: no rows
        4: bytes(rng.randrange(256) for _ in range(64)),
    }
    got: dict[int, set[str]] = {}
    for r in MM.cdc_chunk_digests(_media(spark, payloads)).collect():
        got.setdefault(r.media_id, set()).add(r.digest)
    assert 3 not in got
    for mid in (1, 2, 4):
        assert got[mid] == _cdc_digests_py(payloads[mid]), mid
    assert len(got[2]) == 1


def test_cdc_boundaries_realign_after_edit(spark):
    """The CDC contract: inserting bytes EARLY in the payload leaves the
    chunks after the edit window intact — the digest sets still overlap
    heavily, which is exactly what position-based chunking loses."""
    import random

    rng = random.Random(11)
    base = bytes(rng.randrange(256) for _ in range(2000))
    edited = base[:50] + b"INSERTED!" + base[50:]
    a, b = _cdc_digests_py(base), _cdc_digests_py(edited)
    shared = len(a & b)
    assert len(a) > 10  # payload actually chunked
    jacc = shared / len(a | b)
    assert jacc > 0.7, (len(a), len(b), shared)
    # Spark agrees with the replica on the edited payload too
    got = {
        r.digest
        for r in MM.cdc_chunk_digests(_media(spark, {9: edited})).collect()
    }
    assert got == b


def test_cdc_neardup_pairs_df_cap_and_jaccard(spark):
    # Doc 1 and 2 share 3 of 4 distinctive digests; digest "hot" appears in
    # all four docs and must be dropped by max_df=3 BEFORE scoring.
    rows = [
        (1, "hot"), (1, "a"), (1, "b"), (1, "c"), (1, "x1"),
        (2, "hot"), (2, "a"), (2, "b"), (2, "c"), (2, "y1"),
        (3, "hot"), (3, "z1"), (3, "z2"),
        (4, "hot"), (4, "w1"),
    ]
    digests = spark.createDataFrame(rows, ["media_id", "digest"])
    got = {
        (r.id_a, r.id_b): r
        for r in MM.cdc_neardup_pairs(digests, max_df=3, min_jaccard_bp=5000).collect()
    }
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    # capped universe: doc1 {a,b,c,x1} doc2 {a,b,c,y1} -> 3 shared of 5 union
    assert (r.shared, r.na, r.nb, r.jaccard_bp) == (3, 4, 4, 10000 * 3 // 5)


def test_cdc_neardup_finds_edited_copy_not_unrelated(spark):
    import random

    rng = random.Random(13)
    base = bytes(rng.randrange(256) for _ in range(2000))
    edited = base[:300] + b"@@@@" + base[300:1200] + base[1210:]
    unrelated = bytes(rng.randrange(256) for _ in range(2000))
    media = _media(spark, {1: base, 2: edited, 3: unrelated})
    pairs = MM.cdc_neardup_pairs(
        MM.cdc_chunk_digests(media), max_df=50, min_jaccard_bp=5000
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}


def test_warclite_roundtrip_parallelism_and_poison(spark, tmp_path):
    """Custom binary-container source: executor-written shards scan back
    exactly, one partition per shard, truncated tails poison not crash."""
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.sources import warclite as WL

    docs = spark.createDataFrame(
        [(i, bytes([i % 251]) * (10 + i)) for i in range(50)],
        "doc_id long, payload binary",
    ).repartition(4)
    out = str(tmp_path / "shards")
    n_shards = WL.write_corpus(docs, out, "doc_id", "payload")
    assert 1 <= n_shards <= 4

    WL.register(spark)
    scanned = spark.read.format("warclite").load(out)
    assert scanned.rdd.getNumPartitions() == n_shards
    got = {r.doc_id: bytes(r.payload) for r in scanned.collect()}
    assert got == {i: bytes([i % 251]) * (10 + i) for i in range(50)}

    # truncate one shard mid-payload: scan yields ONE poison row for it
    import os

    shard = sorted(os.listdir(out))[0]
    full = os.path.join(out, shard)
    os.truncate(full, os.path.getsize(full) - 3)
    rescanned = spark.read.format("warclite").load(out)
    poison = rescanned.filter(F.col("payload").isNull()).collect()
    assert len(poison) == 1 and poison[0].shard == shard
    ok = rescanned.filter(F.col("payload").isNotNull()).count()
    assert ok == 50 - 1  # only the truncated record is lost


def test_warclite_stream_tails_new_shards_exactly_once(spark, tmp_path):
    """Custom streaming source: a second drain with the same checkpoint
    reads ONLY the shards that appeared in between — offset = consumed
    shard NAME set, committed through the engine checkpoint."""
    import os

    from payroll_etl_fastapi_spark.sources import warclite as WL

    d = str(tmp_path / "shards")
    os.makedirs(d)

    def add_shard(idx, ids):
        with open(os.path.join(d, f"part-{idx:05d}.warclite"), "wb") as fh:
            for i in ids:
                fh.write(WL.pack_record(i, b"p" * 4))

    add_shard(0, [1, 2])
    add_shard(1, [3])
    WL.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("warclite")
            .option("path", d)
            .load()
            .select("doc_id", "shard")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.doc_id for r in spark.read.parquet(out).collect())

    assert drain() == [1, 2, 3]
    add_shard(2, [4, 5])
    # SAME checkpoint: only the new shard arrives (cumulative sink output)
    assert drain() == [1, 2, 3, 4, 5]
    # nothing new: drain adds nothing
    assert drain() == [1, 2, 3, 4, 5]
    # OUT-OF-ORDER arrival: write_corpus tasks finish in arbitrary order, so
    # a lexicographically-EARLIER shard can land after later ones were
    # consumed. The name-set offset picks it up exactly once; a count/
    # positional offset would re-read the tail and skip the newcomer.
    with open(os.path.join(d, "part-00000-late.warclite"), "wb") as fh:
        fh.write(WL.pack_record(6, b"p" * 4))
    assert drain() == [1, 2, 3, 4, 5, 6]
    assert drain() == [1, 2, 3, 4, 5, 6]


def test_warclite_stream_max_shards_per_trigger(spark, tmp_path):
    """maxShardsPerTrigger caps shards per micro-batch: an availableNow
    drain over 5 shards with a cap of 2 still consumes everything (the
    engine loops batches), but no single batch materializes more than 2
    shards' records in the reader."""
    import os

    from payroll_etl_fastapi_spark.sources import warclite as WL
    from payroll_etl_fastapi_spark.sources.warclite import _WarcLiteStreamReader

    d = str(tmp_path / "shards")
    os.makedirs(d)
    for idx in range(5):
        with open(os.path.join(d, f"part-{idx:05d}.warclite"), "wb") as fh:
            fh.write(WL.pack_record(idx, b"p" * 4))

    # unit-level: one read() consumes at most the cap, and successive reads
    # from the returned offsets cover the directory exactly once
    rdr = _WarcLiteStreamReader({"path": d, "maxShardsPerTrigger": "2"})
    seen: list[int] = []
    off = rdr.initialOffset()
    sizes = []
    for _ in range(4):
        recs, off = rdr.read(off)
        batch = [r[0] for r in recs]
        sizes.append(len(batch))
        seen.extend(batch)
    assert sizes == [2, 2, 1, 0]
    assert sorted(seen) == [0, 1, 2, 3, 4]

    # engine-level: the capped stream still drains the whole directory.
    # availableNow falls back to SINGLE-batch execution for Python stream
    # sources, so one drain = one capped micro-batch — successive drains
    # from the same checkpoint walk the directory 2-2-1 with no re-reads.
    WL.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain() -> list[int]:
        q = (
            spark.readStream.format("warclite")
            .option("path", d)
            .option("maxShardsPerTrigger", "2")
            .load()
            .select("doc_id")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.doc_id for r in spark.read.parquet(out).collect())

    assert len(drain()) == 2
    assert len(drain()) == 4
    assert drain() == [0, 1, 2, 3, 4]
    assert drain() == [0, 1, 2, 3, 4]


def test_warclite_stream_offset_compaction_and_migration(tmp_path):
    """Round-6 offset hardening (unit level, no engine needed):
    1. the committed offset stays O(watermarkLagShards) however many shards
       are consumed (pre-fix it was the full name list — O(total shards)
       per micro-batch in the checkpoint log);
    2. out-of-order arrival within the lag window is still consumed exactly
       once after compaction;
    3. a maxShardsPerTrigger backlog is never folded under the watermark
       (the smallest unconsumed listed name is a hard ceiling);
    4. legacy r4 {"n": k} and r5 {"consumed": [...]} checkpoint offsets are
       migrated instead of raising KeyError;
    5. maxShardsPerTrigger < 0 is rejected at construction."""
    import os

    import pytest

    from payroll_etl_fastapi_spark.sources import warclite as WL
    from payroll_etl_fastapi_spark.sources.warclite import _WarcLiteStreamReader

    d = str(tmp_path / "shards")
    os.makedirs(d)

    def add(name, ids):
        with open(os.path.join(d, f"{name}.warclite"), "wb") as fh:
            for i in ids:
                fh.write(WL.pack_record(i, b"p" * 4))

    for i in range(40):
        add(f"part-{i:05d}", [i])

    # 1: offset bounded by the lag, not by shards consumed
    rdr = _WarcLiteStreamReader({"path": d, "watermarkLagShards": "8"})
    recs, off = rdr.read(rdr.initialOffset())
    assert len(list(recs)) == 40
    assert len(off["extra"]) == 8 and off["w"] == "part-00031.warclite"
    recs2, off2 = rdr.read(off)
    assert list(recs2) == [] and off2 == off

    # 2: a shard arriving out of order but ABOVE the watermark is consumed
    add("part-00033-late", [100])
    recs3, off3 = rdr.read(off2)
    assert [r[0] for r in recs3] == [100]
    recs4, off4 = rdr.read(off3)
    assert list(recs4) == []

    # replay between committed offsets reproduces exactly that batch
    assert [r[0] for r in rdr.readBetweenOffsets(off2, off3)] == [100]

    # 3: with a trigger cap the backlog stays fresh — the watermark never
    # passes the smallest unconsumed listed name
    capped = _WarcLiteStreamReader(
        {"path": d, "maxShardsPerTrigger": "3", "watermarkLagShards": "2"}
    )
    seen, off_c = [], capped.initialOffset()
    for _ in range(20):
        r, off_c = capped.read(off_c)
        seen.extend(x[0] for x in r)
    assert sorted(seen) == sorted(list(range(40)) + [100])

    # 4: legacy offsets migrate (r4 positional / r5 exact-set)
    r_leg, off_leg = rdr.read({"n": 39})
    got = sorted(x[0] for x in r_leg)
    # first 39 of the 41 sorted names count as consumed ("-late" sorts
    # before ".warclite", so the late shard is inside that prefix); the
    # two lexicographic stragglers are the fresh batch
    assert got == [38, 39]
    r_leg2, _ = rdr.read({"consumed": [f"part-{i:05d}.warclite" for i in range(40)]})
    assert [x[0] for x in r_leg2] == [100]

    # 5: option validation
    with pytest.raises(ValueError, match="maxShardsPerTrigger"):
        _WarcLiteStreamReader({"path": d, "maxShardsPerTrigger": "-1"})
    with pytest.raises(ValueError, match="watermarkLagShards"):
        _WarcLiteStreamReader({"path": d, "watermarkLagShards": "0"})

    # 6: REPLAY PURITY (ADVICE r6): an out-of-contract shard landing BELOW
    # the committed watermark after the batch ran must not be injected into
    # a crash-recovery replay — the end offset's listing timestamp excludes
    # it, so replay and the normal read path agree (both skip it).
    # "part-00031a" sorts between off2's watermark (part-00031) and off3's
    # (part-00032), the exact window the pre-fix reconstruction injected.
    add("part-00031a", [999])
    assert [r[0] for r in rdr.readBetweenOffsets(off2, off3)] == [100]
    r_norm, _ = rdr.read(off3)
    assert 999 not in [x[0] for x in r_norm]  # normal path skips it too
    # pre-r7 offsets carry no timestamp: replay falls back to the legacy
    # (listing-reconstructed) behavior and DOES include the late shard —
    # the documented migration carve-out
    legacy_off2 = {"w": off2["w"], "extra": off2["extra"]}
    legacy_off3 = {"w": off3["w"], "extra": off3["extra"]}
    assert [r[0] for r in rdr.readBetweenOffsets(legacy_off2, legacy_off3)] == [
        999,
        100,
    ]


# ---------------------------------------------------------------------------
# perceptual near-dup (round 9): dHash fingerprints + Hamming bands
# ---------------------------------------------------------------------------


def _gray(spark, rows):
    return spark.createDataFrame(
        [
            (i, "image", payload, ("raw", w, h, None))
            for i, payload, w, h in rows
        ],
        MM.MEDIA_SCHEMA,
    )


def test_dhash_planted_neardup_found_unrelated_not(spark):
    """A copy with two flipped pixels sits within a couple of bits; an
    unrelated image does not pair — and recall for hamming < 4 is
    guaranteed by the 4-band pigeonhole."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    near = base.copy()
    near[0, 0] ^= 255
    near[9, 13] ^= 200
    far = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    df = _gray(
        spark,
        [
            (1, bytes(base.tobytes()), 16, 16),
            (2, bytes(near.tobytes()), 16, 16),
            (3, bytes(far.tobytes()), 16, 16),
        ],
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in MM.dhash_neardup_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_dhash_invariant_under_exact_nearest_upscale(spark):
    """The defining perceptual property: a 2x nearest-neighbor upscale
    changes every byte offset yet samples to the IDENTICAL 64 bits
    (floor(floor(2a)/2) == floor(a)), so the re-scaled copy hashes equal —
    the case byte-level CDC dedup cannot catch."""
    import numpy as np

    rng = np.random.default_rng(12)
    base = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    up = base[np.repeat(np.arange(16), 2)][:, np.repeat(np.arange(16), 2)]
    df = _gray(
        spark,
        [(1, bytes(base.tobytes()), 16, 16), (2, bytes(up.tobytes()), 32, 32)],
    )
    sig = {r.id: tuple(r.bands) for r in MM.dhash_signatures(df).collect()}
    assert sig[1] == sig[2]
    pairs = {(r.id_a, r.id_b): r.hamming for r in MM.dhash_neardup_pairs(df).collect()}
    assert pairs == {(1, 2): 0}


def test_dhash_poisons_undecodable_rows(spark):
    """Null payloads and payloads contradicting meta dimensions yield NULL
    bands (the resize_images poison convention) and never enter the join."""
    df = _gray(
        spark,
        [
            (1, None, 16, 16),
            (2, b"short", 16, 16),
            (3, bytes(range(256)), 16, 16),
            (4, bytes(256), 0, 16),
        ],
    )
    sig = {r.id: r.bands for r in MM.dhash_signatures(df).collect()}
    assert sig[1] is None and sig[2] is None and sig[4] is None
    assert sig[3] is not None
    assert MM.dhash_neardup_pairs(df).count() == 0


def test_dhash_matches_python_replica(spark):
    """Bit-for-bit against a straightforward numpy dHash (same grid, same
    comparisons, same MSB band fold)."""
    import numpy as np

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)  # non-square
    df = _gray(spark, [(1, bytes(img.tobytes()), 40, 24)])
    r = MM.dhash_signatures(df).collect()[0]
    got = tuple(r.bands)
    bits = []
    for b in range(64):
        rr, cc = b // 8, b % 8
        sr = (rr * 24) // 8
        cl = (cc * 40) // 9
        cr = ((cc + 1) * 40) // 9
        bits.append(1 if img[sr, cl] < img[sr, cr] else 0)
    want = tuple(
        int("".join(map(str, bits[j * 16 : (j + 1) * 16])), 2) for j in range(4)
    )
    assert got == want


def test_dhash_arrow_twin_bit_identical(spark):
    """The numpy fast path and the SQL reference path are the SAME integer
    function — bands agree bit-for-bit, poison rules included."""
    import numpy as np

    rng = np.random.default_rng(21)
    rows = [
        (1, bytes(rng.integers(0, 256, 16 * 16, dtype=np.uint8)), 16, 16),
        (2, bytes(rng.integers(0, 256, 24 * 40, dtype=np.uint8)), 40, 24),
        (3, None, 16, 16),
        (4, b"bad", 16, 16),
    ]
    df = _gray(spark, rows)
    sql_sig = {r.id: r.bands for r in MM.dhash_signatures(df).collect()}
    arrow_sig = {r.id: r.bands for r in MM.dhash_signatures_arrow(df).collect()}
    assert sql_sig == arrow_sig and sql_sig[3] is None and sql_sig[2] is not None
