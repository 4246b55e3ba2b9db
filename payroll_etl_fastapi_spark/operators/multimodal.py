"""Multimodal (image/audio/video) column plumbing.

No reference counterpart (/root/reference is payroll CSV only); this is the
training-data-pipeline extension: media travel as opaque `binary` payload
columns with a typed metadata struct, and decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas iterators over `mapInPandas`.

The CODEC step is the swappable part — the real codec libraries (Pillow,
torchaudio, pyav) are not in this container, so payloads use codec-free
deterministic representations (RAW_GRAY8 pixels for resize, fixed-width
fake frames for sampling, digest features for embedding), clearly marked.
Everything Spark-side — schemas, UDF signatures, Arrow batch shapes,
re-chunking, null-poisoning of undecodable rows, partition behavior — plus
the actual resample math is real and tested end-to-end.

Scale notes (100 TB of media):
- payloads stay OFF the shuffle path: every operator here is a per-partition
  map (mapInPandas) — no shuffle touches a binary column; group/join steps
  downstream should operate on the extracted metadata/features only, carrying
  a (media_id) key and re-joining payloads only if re-materialization is
  genuinely needed.
- Arrow moves the bytes executor→Python zero-copy per batch;
  spark.sql.execution.arrow.maxRecordsPerBatch bounds peak Python memory
  (payloads are large — batches should be sized by bytes, so the iterator
  re-chunks internally by _MAX_BATCH_BYTES).
- on a real cluster the payload column would live in its own parquet column
  chunk; column pruning means metadata-only queries never read the bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha16", StringType()),  # first 16 hex of sha256
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)

_MAX_BATCH_BYTES = 64 << 20  # re-chunk threshold inside the iterator

_FEATURE_DIM = 8


def _features_from_digest(digest: bytes) -> list[float]:
    """8 doubles from a sha256 digest, scaled to [0, 1)."""
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(_FEATURE_DIM)
    ]


def _fake_decode_features(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE of a decode→embed step: 8 doubles from the sha256
    digest, scaled to [0, 1). Swap for a real codec + model when available."""
    return _features_from_digest(hashlib.sha256(payload).digest())


def extract_features(media: DataFrame) -> DataFrame:
    """payload → fixed-dim feature vector + content hash, via mapInPandas.

    The iterator contract is the real thing: consume input batches lazily,
    re-chunk output so huge payload batches can't balloon Python memory."""

    cols = ("media_id", "kind", "n_bytes", "sha16", "features")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise zip, not iterrows(): no per-row Series construction
            out: dict[str, list] = {c: [] for c in cols}
            acc_bytes = 0
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                # payload is nullable — treat null as empty, don't crash the task
                p = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(p).digest()
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["n_bytes"].append(len(p))
                out["sha16"].append(digest[:8].hex())
                out["features"].append(_features_from_digest(digest))
                acc_bytes += len(p)
                if acc_bytes >= _MAX_BATCH_BYTES:
                    yield pd.DataFrame(out)
                    out, acc_bytes = {c: [] for c in cols}, 0
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize over a codec-free raw format: the payload
    is interpreted as RAW_GRAY8 — ``meta.width × meta.height`` row-major
    bytes, one per pixel — and resampled with numpy index selection (the
    actual pixel math of a nearest-neighbor resize, batched per Arrow chunk).
    What a production build swaps in is only the DECODE step (JPEG/PNG →
    raw) — the resample, schema rewrite (payload replaced, meta.width/height
    updated), and memory shape here are the real thing.

    Undecodable rows (null payload, missing dimensions, or a payload whose
    length contradicts them) pass through with ``payload = NULL`` and their
    original meta — the poison-marking shape a training pipeline filters on,
    rather than a task-killing exception five hours into a 100 TB job."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yi_cache: dict[tuple[int, int], object] = {}

        def _resize(p: bytes, w0: int, h0: int) -> bytes:
            arr = np.frombuffer(p, dtype=np.uint8).reshape(h0, w0)
            yi = yi_cache.setdefault(
                (h0, height), (np.arange(height) * h0) // height
            )
            xi = yi_cache.setdefault((w0, width), (np.arange(width) * w0) // width)
            return arr[np.ix_(yi, xi)].tobytes()

        for pdf in batches:
            out_payload: list = []
            out_meta: list = []
            for kind, payload, meta in zip(pdf["kind"], pdf["payload"], pdf["meta"]):
                # only image rows are resize candidates: audio/video rows in
                # a mixed media frame pass through UNTOUCHED (poisoning them
                # would destroy every non-image payload in the pipeline, and
                # a video whose byte length happens to equal w*h would be
                # "resized" into gray8 garbage)
                if kind != "image":
                    out_payload.append(payload)
                    out_meta.append(meta)
                    continue
                w0 = meta.get("width") if meta is not None else None
                h0 = meta.get("height") if meta is not None else None
                ok = (
                    payload is not None
                    and w0 is not None
                    and h0 is not None
                    and len(payload) == w0 * h0
                    and w0 > 0
                    and h0 > 0
                )
                if ok:
                    out_payload.append(_resize(bytes(payload), int(w0), int(h0)))
                    out_meta.append({**meta, "width": width, "height": height})
                else:
                    out_payload.append(None)
                    out_meta.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, media.schema)


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 3) -> DataFrame:
    """Frame sampling over video payloads via a DETERMINISTIC FAKE splitter:
    the payload is treated as fixed 16-byte frames, every `every_n`-th taken,
    capped at `max_frames`. One input row fans out to ≤ max_frames rows —
    the real exploding-cardinality shape of a frame sampler."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            fbytes: list = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue  # null payload → no frames, like an empty one
                p = bytes(payload)
                frames = [p[i : i + 16] for i in range(0, len(p), 16)][::every_n][
                    :max_frames
                ]
                for idx, fb in enumerate(frames):
                    ids.append(mid)
                    idxs.append(idx)
                    fbytes.append(fb)
            if ids:
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": idxs, "frame_bytes": fbytes}
                )

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: forge a media table from the documents table (UTF-8 bytes as
    payload) so the multimodal plumbing is exercisable on driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
