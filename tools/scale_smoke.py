#!/usr/bin/env python
"""Scale-smoke: do the heavy operator families scale linearly?

Builds a 10x (default) copy of the sf0.1 documents/embeddings/events tables
in a temp dir — id-offset unions written as multi-file parquet, so the scan
parallelism is realistic instead of the single-file single-task shape the
driver testdata has — then times the scale-critical operators on 1x vs Nx
and prints one JSON line with both timings and the growth factor per op.

An op whose growth factor is far above N is super-linear — the plan has a
quadratic step, a driver collect, or a global sort that the small gate data
was hiding. This is the experiment VERDICT r2 asked the plans to be judged
by ("would this hold at 1000x?") run at the largest size the container
affords.

Usage: python tools/scale_smoke.py [multiplier] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402
from payroll_etl_fastapi_spark.operators import bloom as B  # noqa: E402
from payroll_etl_fastapi_spark.operators import dedup  # noqa: E402
from payroll_etl_fastapi_spark.operators import passage  # noqa: E402
from payroll_etl_fastapi_spark.operators import pq as PQ  # noqa: E402
from payroll_etl_fastapi_spark.operators import sketch as SK  # noqa: E402
from payroll_etl_fastapi_spark.operators import quality  # noqa: E402
from payroll_etl_fastapi_spark.operators import search  # noqa: E402
from payroll_etl_fastapi_spark.operators import similarity as sim  # noqa: E402
from payroll_etl_fastapi_spark.operators import multimodal as MM  # noqa: E402
from payroll_etl_fastapi_spark.operators import timeseries as TS  # noqa: E402
from payroll_etl_fastapi_spark.operators.asof import asof_join  # noqa: E402
from payroll_etl_fastapi_spark.sources.txtable import TxTable  # noqa: E402

MULT = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[3:])  # optional op-name subset


def scaled(spark, table: str, id_cols: list[str], base_dir: str, mult: int) -> str:
    """Write `mult` id-offset copies of a table as 32-file parquet."""
    src = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
    offset = 10_000_000
    parts = [
        src.select(
            *[
                (F.col(c) + i * offset).alias(c) if c in id_cols else F.col(c)
                for c in src.columns
            ]
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    path = os.path.join(base_dir, f"{table}_x{mult}")
    out.repartition(32).write.parquet(path)
    return path


def timed(fn) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = fn()
    return round(time.perf_counter() - t0, 2), n


def ops_for(spark, docs: DataFrame, emb: DataFrame, events: DataFrame, lineitem: DataFrame):
    """op name -> zero-arg callable returning a row count (forces full exec)."""
    queries_docs = docs.filter(F.col("doc_id") % 997 == 0)
    qterms = queries_docs.select(
        F.col("doc_id").alias("query_id"),
        F.explode(
            F.array_distinct(
                F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 4)
            )
        ).alias("term"),
    )
    queries_emb = emb.filter(F.col("vec_id") % 499 == 0).limit(20)
    mins = events.select(
        "user_id",
        F.date_trunc("minute", F.col("ts")).alias("ts"),
        F.col("value"),
    ).dropDuplicates(["user_id", "ts"])
    return {
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs).count(),
        "dedup_simhash": lambda: dedup.simhash_pairs(docs).count(),
        "bm25_topk": lambda: search.bm25_topk(docs, qterms, k=10).count(),
        "ann_lsh_topk": lambda: sim.lsh_topk(emb, queries_emb, 10, dim=64).count(),
        "embedding_near_dup": lambda: sim.embedding_near_dup_pairs(
            emb, threshold=0.95, dim=64
        ).count(),
        "asof_join": lambda: asof_join(
            events.select("event_id", "user_id", "ts"),
            mins,
            on=["user_id"],
            values=["value"],
        ).count(),
        # round-4 additions (VERDICT r3 #8): the round-3 operator families
        "quality_audit": lambda: (
            quality.check(
                events,
                [
                    quality.not_null("user_id"),
                    quality.in_range("value", 0.0, 1e12),
                    quality.matches("event_type", "^[a-z_]+$"),
                ],
            ).count()
            + quality.unique(events, ["event_id"]).count()
        ),
        "passage_scrub": lambda: passage.scrub_common_passages(
            docs, chunk_words=10, min_docs=5
        ).count(),
        "txtable_delete_optimize": lambda: _txtable_lifecycle(spark, docs),
        # round-4-tail additions: bloom semi-join reduction, HLL/CMS
        # sketches, IVF-PQ, SemDeDup
        "bloom_filtered_join": lambda: _bloom_join(events),
        "hll_by_event_type": lambda: SK.hll_estimate(
            SK.hll_registers(events, "user_id", ["event_type"]),
            ["event_type"],
        ).count(),
        "cms_build": lambda: SK.cms_build(events, "user_id").count(),
        "ivf_pq_topk": lambda: PQ.ivf_pq_topk(
            emb,
            queries_emb,
            PQ.ivf_centroids_random(8, 64),
            PQ.pq_codebooks_random(4, 8, 64),
            k=10,
            n_probe=2,
        ).count(),
        # SemDeDup's published scaling rule fixes cluster SIZE, not count:
        # the quadratic is per-cluster, so k grows with the corpus — the
        # smoke scales k with the multiplier exactly as a production run
        # would. Centroids are lowest-id corpus vectors (the gate's
        # deterministic data-dependent sampling): random centroids
        # concentrate a 64-dim corpus into a few giant clusters and the
        # n²/k bound evaporates
        # round-4 post-tail additions: HDR quantiles, duplicate-span
        # dedup, DSIR weights
        "hdr_quantiles": lambda: SK.hdr_quantiles(
            SK.hdr_histogram(
                events.select(
                    "event_type",
                    F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5))
                    .cast("long")
                    .alias("v"),
                ),
                "v",
                ["event_type"],
            ),
            group_cols=["event_type"],
        ).count(),
        "duplicate_spans": lambda: dedup.duplicate_span_stats(
            docs, "text", "doc_id"
        ).count(),
        "dsir_weights": lambda: _dsir(docs),
        # round-4 post-tail analytics: funnel/cohort/transitions/gap-fill
        # over events; PageRank/assoc rules over the scaled basket graph
        "funnel": lambda: _funnel(events),
        "cohort_retention": lambda: _cohort(events),
        "transition_matrix": lambda: _transitions(events),
        "resample_gapfill": lambda: _gapfill(events),
        "pagerank": lambda: _pagerank(lineitem),
        "assoc_rules": lambda: _assoc(lineitem),
        "label_propagation": lambda: _label_prop(lineitem),
        "triangle_counts": lambda: _triangles(lineitem),
        # round-4 third-session additions: CDC binary near-dup, rolling HLL
        "cdc_neardup": lambda: MM.cdc_neardup_pairs(
            MM.cdc_chunk_digests(MM.media_from_documents(docs))
        ).count(),
        "rolling_hll": lambda: TS.rolling_hll_distinct(
            events, "user_id", "ts"
        ).count(),
        "bfs_hops": lambda: _bfs(lineitem),
        "range_frame": lambda: _range_frame(events),
        # round-4 fifth-session additions: interval-union merge and
        # df-capped containment join
        "interval_merge": lambda: _interval_merge(events),
        "containment": lambda: dedup.containment_pairs(docs).count(),
        "warclite_roundtrip": lambda: _warclite(spark, docs),
        # round-6 addition: cross-snapshot incremental dedup — cost must
        # track the BATCH, not the persisted index's corpus
        "incremental_dedup": lambda: _incremental_dedup(spark, docs),
        # round-6 addition: the embedding sibling — frozen quantizer, index
        # joined via broadcast batch, cost tracks the batch again
        "incremental_semantic": lambda: _incremental_semantic(spark, emb),
        "semantic_dedup": lambda: sim.semantic_dedup(
            emb,
            [
                [float(x) for x in r.embedding]
                for r in emb.orderBy("vec_id").limit(64 * mult_of(emb)).collect()
            ],
            threshold=0.95,
        ).count(),
    }


_BASE_EMB_ROWS: list[int] = []


def mult_of(emb: DataFrame) -> int:
    """Infer the current multiplier from the corpus size (the ops dict is
    rebuilt per multiplier, but the frames are what vary)."""
    n = emb.count()
    if not _BASE_EMB_ROWS:
        _BASE_EMB_ROWS.append(n)
    return max(1, n // _BASE_EMB_ROWS[0])


def _funnel(events: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.funnel import funnel_counts

    return funnel_counts(events, ["view", "click", "purchase"]).count()


def _cohort(events: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.funnel import cohort_retention

    return cohort_retention(events).count()


def _transitions(events: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.funnel import transition_matrix

    return transition_matrix(events).count()


def _gapfill(events: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.timeseries import resample_locf

    sel = events.filter(F.col("user_id") % 30 == 0)
    return resample_locf(
        sel, "user_id", "ts", F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
    ).count()


def _label_prop(lineitem: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.graph import (
        copurchase_edges,
        label_propagation,
    )

    return label_propagation(
        copurchase_edges(lineitem), iterations=2, broadcast_labels=True
    ).count()


def _triangles(lineitem: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.graph import (
        copurchase_edges,
        triangle_counts,
    )

    # same degree bound as the gate: wedge volume is the intended cost
    sub = lineitem.filter(F.col("l_orderkey") % 7 == 0)
    return triangle_counts(copurchase_edges(sub)).count()


def _bfs(lineitem: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.graph import bfs_hops, copurchase_edges

    edges = copurchase_edges(lineitem.filter(F.col("l_orderkey") % 7 == 0))
    sources = (
        edges.select(F.col("src").alias("node")).distinct().orderBy("node").limit(3)
    )
    return bfs_hops(edges, sources, max_hops=4, broadcast_frontier=True).count()


def _range_frame(events: DataFrame) -> int:
    from pyspark.sql import Window

    # raw parquet carries TIMESTAMP_NTZ; the catalog loader normalizes, the
    # smoke casts inline
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-(3600 * 1_000_000 - 1), Window.currentRow)
    )
    return (
        events.select(
            "event_id", F.sum(F.floor(F.col("value") * 100)).over(win).alias("c")
        ).count()
    )


def _interval_merge(events: DataFrame) -> int:
    iv = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (1 + F.pmod(F.floor(F.col("value") * 100).cast("long"), F.lit(30)))
            * F.lit(60_000_000)
        ).alias("e"),
    )
    return TS.merge_intervals(iv, "user_id", "s", "e", "event_id").count()


def _incremental_dedup(spark, docs: DataFrame) -> int:
    """Two-snapshot incremental ingest: evens build the index, the full
    corpus arrives as the next batch (half rejected as index dups)."""
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    scratch = tempfile.mkdtemp(prefix="scale_incdedup_")
    try:
        index = TxTable(spark, os.path.join(scratch, "idx"))
        dedup.incremental_minhash_dedup(
            index, docs.filter(F.col("doc_id") % 2 == 0)
        )
        return dedup.incremental_minhash_dedup(index, docs).count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _incremental_semantic(spark, emb: DataFrame) -> int:
    """Two-snapshot SemDeDup ingest: evens freeze the quantizer and build the
    vector index, the full corpus arrives as the next batch (evens rejected
    as exact index dups). k scales with the corpus (the SemDeDup rule)."""
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    snap = emb.filter(F.col("vec_id") % 2 == 0)
    cents = [
        [float(x) for x in r.embedding]
        for r in snap.orderBy("vec_id").limit(64 * mult_of(emb)).collect()
    ]
    scratch = tempfile.mkdtemp(prefix="scale_incsem_")
    try:
        index = TxTable(spark, os.path.join(scratch, "vec_idx"))
        sim.incremental_semantic_dedup(index, snap, cents, threshold=0.95)
        return sim.incremental_semantic_dedup(
            index, emb, cents, threshold=0.95
        ).count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _warclite(spark, docs: DataFrame) -> int:
    import shutil
    import tempfile

    from payroll_etl_fastapi_spark.sources import warclite as WL

    scratch = tempfile.mkdtemp(prefix="scale_warclite_")
    try:
        WL.write_corpus(
            docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("p"))
            .repartition(32),
            scratch,
            "doc_id",
            "p",
        )
        WL.register(spark)
        return spark.read.format("warclite").load(scratch).count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _pagerank(lineitem: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.graph import copurchase_edges, pagerank

    return pagerank(copurchase_edges(lineitem), iterations=3).count()


def _assoc(lineitem: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.assoc import pair_association_rules

    return pair_association_rules(
        lineitem, "l_orderkey", "l_partkey", min_pair_count=2, top_k=20
    ).count()


def _dsir(docs: DataFrame) -> int:
    from payroll_etl_fastapi_spark.operators.corpus import dsir_log_weights

    return dsir_log_weights(docs, F.col("lang") == "en", "text", "doc_id").count()


def _bloom_join(events: DataFrame) -> int:
    """Dim = ~1% of users; fact = events Bloom-pruned on the dim keys
    before a merge join — the gate composition at smoke scale."""
    dim = (
        events.select("user_id").distinct().filter(F.col("user_id") % 101 == 0)
    )
    words = B.bloom_build(dim, "user_id")
    pruned = events.filter(B.bloom_might_contain(F.col("user_id"), words))
    return pruned.join(dim.hint("merge"), "user_id").count()


def _txtable_lifecycle(spark, docs: DataFrame) -> int:
    """The txtable_acid_ops-shaped maintenance path: overwrite, COW DELETE
    (full rewrite — the linear-in-table cost under test), then OPTIMIZE
    compaction. Count of the final snapshot forces every job."""
    scratch = tempfile.mkdtemp(prefix="smoke_tx_")
    try:
        t = TxTable(spark, os.path.join(scratch, "t"))
        t.overwrite(docs.select("doc_id", "text"))
        t.delete(F.col("doc_id") % 3 == 2)
        t.optimize(target_bytes=64 * 1024 * 1024)
        return t.snapshot().count()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def main() -> None:
    spark = get_spark("scale-smoke")
    spark.range(1000).selectExpr("sum(id)").collect()
    base = tempfile.mkdtemp(prefix="scale_smoke_")
    results: dict[str, dict] = {}
    try:
        tables = {}
        for mult in (1, MULT):
            tables[mult] = {
                "documents": scaled(spark, "documents", ["doc_id"], base, mult),
                "embeddings": scaled(spark, "embeddings", ["vec_id"], base, mult),
                "events": scaled(spark, "events", ["event_id", "user_id"], base, mult),
                # offset BOTH keys: copies form disjoint baskets AND a
                # disjoint item universe, so the co-purchase graph / rule
                # mining grow linearly instead of collapsing onto one graph
                "lineitem": scaled(
                    spark, "lineitem", ["l_orderkey", "l_partkey"], base, mult
                ),
            }
        for mult in (1, MULT):
            docs = spark.read.parquet(tables[mult]["documents"])
            emb = spark.read.parquet(tables[mult]["embeddings"])
            events = spark.read.parquet(tables[mult]["events"])
            lineitem = spark.read.parquet(tables[mult]["lineitem"])
            for name, fn in ops_for(spark, docs, emb, events, lineitem).items():
                if ONLY and name not in ONLY:
                    continue
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                sec, n = timed(fn)
                results.setdefault(name, {})[f"x{mult}"] = {"sec": sec, "rows": n}
                print(f"x{mult} {name}: {sec}s ({n} rows)", file=sys.stderr)
        for name, r in results.items():
            s1, sN = r["x1"]["sec"], r[f"x{MULT}"]["sec"]
            r["growth"] = round(sN / s1, 1) if s1 > 0 else None
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"multiplier": MULT, "ops": results}))


if __name__ == "__main__":
    main()
