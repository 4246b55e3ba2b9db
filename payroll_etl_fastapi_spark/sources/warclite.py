"""WARC-lite: a length-prefixed binary record format + a pure-Python Spark
DataSource to scan it — the custom-format ingestion story.

Training corpora routinely arrive in record-framed binary containers
(WARC/Common Crawl, TFRecord, proprietary media shards) that Spark has no
built-in reader for. The Spark 4 Python Data Source API closes that gap
without JVM code: this module defines the simplest useful such container
and wires it in end to end —

    file   := record*
    record := length:uint64_be  doc_id:uint64_be  payload:bytes[length]

`spark.read.format("warclite").load(dir)` after `register(spark)`.

Scale shape (100 TB of shards):
- PARTITION PLANNING: one InputPartition per shard file — the driver only
  LISTS the directory (cheap); every byte of record data is read inside
  executor tasks, in parallel across files. This is exactly how the
  built-in file sources scale, expressed through the Python API.
- WRITES are executor-side too: `write_corpus` emits one shard per input
  partition via mapInPandas (an Arrow-batched sink pass) — no
  driver-collect of payload bytes anywhere.
- POISON, NOT CRASH: a truncated/corrupt tail yields one row with
  ``payload = NULL`` and the error offset instead of killing the task five
  hours into a backfill — the same convention operators/multimodal.py uses
  for undecodable media. Downstream filters on ``payload IS NULL``.

No reference counterpart (/root/reference is CSV-only); this extends the
S-series source inventory with the binary-container case.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_HDR = struct.Struct(">QQ")  # length, doc_id — fixed 16-byte big-endian header

SCAN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", StringType()),
        StructField("offset", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def pack_record(doc_id: int, payload: bytes) -> bytes:
    return _HDR.pack(len(payload), doc_id) + payload


def iter_records(path: str):
    """Yield (doc_id, offset, payload|None) from one shard; a short header
    or truncated payload yields ONE poison row (payload None) and stops."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        off = 0
        while off < size:
            hdr = fh.read(_HDR.size)
            if len(hdr) < _HDR.size:
                yield (-1, off, None)
                return
            length, doc_id = _HDR.unpack(hdr)
            payload = fh.read(length)
            if len(payload) < length:
                yield (doc_id, off, None)
                return
            yield (doc_id, off, payload)
            off += _HDR.size + length


class _WarcLiteReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warclite: .load(dir) path is required")
        self.path = path

    def partitions(self):
        # driver work = directory listing ONLY; record IO happens in read()
        shards = sorted(
            n for n in os.listdir(self.path) if n.endswith(".warclite")
        )
        if not shards:
            raise FileNotFoundError(f"warclite: no *.warclite shards in {self.path}")
        return [InputPartition(n) for n in shards]

    def read(self, partition):
        shard = partition.value
        full = os.path.join(self.path, shard)
        for doc_id, off, payload in iter_records(full):
            yield (doc_id, shard, off, payload)


class _WarcLiteStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed shard tailing: the stream offset is the SET of
    consumed shard NAMES (shards are append-only and immutable by
    `write_corpus` contract — the atomic os.replace publish means a listed
    shard is always complete). Each micro-batch reads the set difference
    listing − consumed, so arrival ORDER doesn't matter: write_corpus
    tasks finish in arbitrary order, and a lexicographically-earlier shard
    landing after later ones were consumed is still picked up exactly once
    (a positional/count offset would re-read the tail AND skip the
    newcomer). A restart from the checkpoint resumes from the last
    acknowledged name set — exactly-once ingestion over a custom
    container, the file-stream contract re-expressed through the Python
    API.

    OFFSET SIZE is bounded: the committed offset is a watermark name plus
    an explicit frontier set of at most ``watermarkLagShards`` recent names
    (``{"w": name, "extra": [names]}``) — a name is "consumed" iff it is
    ≤ the watermark or in the frontier. Names only fold under the watermark
    once every LISTED name below them is consumed and they have at least
    ``watermarkLagShards`` (default 256) newer consumed names above them,
    so the documented reordering contract is: a shard may arrive out of
    order by up to the lag window; a shard whose name sorts below a
    committed watermark arriving EVEN LATER than that is outside the
    contract (it would be treated as already consumed). Set the lag high to
    trade offset size for a wider reorder window. Without compaction the
    offset/commit log grew O(total shards ever consumed) per micro-batch.

    Offsets written by earlier builds are migrated on read: the r5 exact
    name-set form ``{"consumed": [...]}`` is accepted as watermark ""
    + that frontier, and the r4 positional form ``{"n": k}`` translates to
    the first k shards of the current sorted listing (valid because r4
    consumption was by sorted position).

    REPLAY PURITY: each committed offset also records the batch's listing
    timestamp ``t``. Crash-recovery replay (readBetweenOffsets) must
    reconstruct below-watermark names from the current directory listing
    (the watermark compressed them out of the offset), so ``t`` is what
    keeps replay a pure function of the committed offsets: a shard whose
    mtime postdates ``t`` landed after the batch ran (an out-of-contract
    below-watermark arrival) and is excluded from replay, exactly as the
    normal read path skips it. Pre-r7 offsets carry no ``t``; their replay
    may include such a late arrival the normal path would skip — legacy
    behavior that self-heals at the next committed offset.

    Option ``maxShardsPerTrigger`` (int ≥ 0; 0/absent = unbounded) caps how
    many new shards one micro-batch consumes, bounding reader memory on the
    first drain of a large directory."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warclite: .load(dir) path is required")
        self.path = path
        self.max_shards = int(options.get("maxShardsPerTrigger", 0) or 0)
        if self.max_shards < 0:
            raise ValueError(
                f"warclite: maxShardsPerTrigger must be >= 0 "
                f"(0/absent = unbounded), got {self.max_shards}"
            )
        self.lag = int(options.get("watermarkLagShards", 256) or 256)
        if self.lag < 1:
            raise ValueError(
                f"warclite: watermarkLagShards must be >= 1, got {self.lag}"
            )

    def _listing(self) -> list[str]:
        return sorted(n for n in os.listdir(self.path) if n.endswith(".warclite"))

    def initialOffset(self):
        return {"w": "", "extra": []}

    def _parse(self, off, listing):
        """(watermark, frontier-set) from any historical offset format."""
        if "n" in off:  # r4 positional offset: count into the sorted listing
            return "", set(listing[: int(off["n"])])
        if "consumed" in off:  # r5 exact name-set offset
            return "", set(off["consumed"])
        return off.get("w", ""), set(off.get("extra", []))

    def _listed_at(self, off) -> float | None:
        """The offset's listing timestamp (None for pre-r7 offsets)."""
        t = off.get("t") if isinstance(off, dict) else None
        return float(t) if t is not None else None

    def _compact(self, w, extra, listing):
        """Fold the oldest frontier names under the watermark, keeping at
        most ``lag`` explicit — never past the smallest listed-but-
        unconsumed name (a maxShardsPerTrigger backlog must stay fresh)."""
        frontier = sorted(n for n in extra if n > w)
        if len(frontier) <= self.lag:
            return w, frontier
        consumed = set(frontier)
        unconsumed = [n for n in listing if n > w and n not in consumed]
        ceiling = min(unconsumed) if unconsumed else None
        for c in frontier[: len(frontier) - self.lag]:
            if ceiling is not None and c > ceiling:
                break
            w = c
        return w, [n for n in frontier if n > w]

    def _records(self, shards) -> list:
        # a LIST, not a generator: the engine caches the read() result for
        # commit-window replay (prefetch copies it), and generators don't
        # pickle. Batch size is bounded by maxShardsPerTrigger when set.
        return [
            (doc_id, s, off, payload)
            for s in shards
            for doc_id, off, payload in iter_records(os.path.join(self.path, s))
        ]

    def read(self, start):
        import time

        listing = self._listing()
        # captured AFTER the listing: every listed (hence consumable) shard
        # has mtime <= t (os.replace publish precedes the listing), so the
        # replay path can use t to exclude shards that landed after this
        # batch ran — see readBetweenOffsets
        t = time.time()
        w, extra = self._parse(start, listing)
        fresh = [n for n in listing if n > w and n not in extra]
        if self.max_shards:
            fresh = fresh[: self.max_shards]
        new_w, new_extra = self._compact(w, extra | set(fresh), listing)
        out = {"w": new_w, "extra": new_extra}
        if fresh:
            out["t"] = t
        else:
            # empty batch: the offset did not advance — carry the previous
            # listing timestamp forward so the offset stays byte-identical
            st = self._listed_at(start)
            if st is not None:
                out["t"] = st
        return iter(self._records(fresh)), out

    def readBetweenOffsets(self, start, end):
        # Replay path (recovery): deterministic because shards are immutable
        # and the batch is defined by the committed offsets — not by
        # whatever the directory holds at replay time. Below-watermark names
        # are reconstructed from the current listing (the watermark
        # compresses them out of the offset), so an OUT-OF-CONTRACT shard
        # that landed below the committed watermark AFTER the batch ran must
        # be excluded here, exactly as the normal read path skips it
        # (ADVICE r6): the end offset carries the batch's listing timestamp
        # `t`, and a below-watermark name is part of the batch only if its
        # mtime predates it. Pre-r7 offsets have no `t`; for them replay may
        # still include a below-watermark late arrival the normal path would
        # skip — documented legacy behavior, self-healing on the next
        # committed offset.
        listing = self._listing()
        sw, sx = self._parse(start, listing)
        ew, ex = self._parse(end, listing)
        et = self._listed_at(end)
        below = {
            n
            for n in listing
            if n <= ew
            and (
                et is None
                or os.path.getmtime(os.path.join(self.path, n)) <= et
            )
        }
        e_set = set(ex) | below
        fresh = sorted(n for n in e_set if n > sw and n not in sx)
        return iter(self._records(fresh))


class WarcLiteDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warclite"

    def schema(self):
        return SCAN_SCHEMA

    def reader(self, schema):
        return _WarcLiteReader(self.options)

    def simpleStreamReader(self, schema):
        return _WarcLiteStreamReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent: registering the same source class twice is harmless."""
    spark.dataSource.register(WarcLiteDataSource)


def write_corpus(df: DataFrame, out_dir: str, id_col: str, payload_col: str) -> int:
    """Write (id, payload) rows as warclite shards, ONE SHARD PER PARTITION,
    executor-side (mapInPandas sink pass — payload bytes never hit the
    driver). Returns the number of shards written. Repartition upstream to
    choose the shard count."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    src = df.select(id_col, payload_col)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        tmp = os.path.join(out_dir, f".tmp-part-{pid:05d}.warclite")
        final = os.path.join(out_dir, f"part-{pid:05d}.warclite")
        n = 0
        with open(tmp, "wb") as fh:
            for pdf in batches:
                for did, payload in zip(pdf[id_col], pdf[payload_col]):
                    fh.write(pack_record(int(did), bytes(payload)))
                    n += 1
        if n:
            os.replace(tmp, final)  # no empty shards, atomic publish
        else:
            os.remove(tmp)
        yield pd.DataFrame({"shard": [final] if n else [], "n": [n] if n else []})

    out = src.mapInPandas(sink, "shard string, n long")
    return out.count()  # the action that runs the sink pass
