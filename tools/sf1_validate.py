#!/usr/bin/env python
"""sf1 scale validation (VERDICT r5 #1 — the round's top ask).

Builds a full sf1-shaped dataset (10× sf0.1: ~6M lineitem, 1M events, 50k
documents, 20k embeddings) by id-offset replication of EVERY table with
join-consistent key offsets — each copy i shifts (orderkey, custkey,
partkey, suppkey, event/user/doc/vec ids) by i×10^8, so intra-copy joins
land exactly as in the base data and copies are disjoint (orders⋈lineitem,
customer⋈orders, the co-purchase graph, LSH bands, everything). Dimension
tables (region, nation) are shared, as at any scale. Tables are written as
multi-file parquet DIRECTORIES named `<t>.parquet`, so scans get realistic
multi-task parallelism instead of the single-file single-task shape of the
driver testdata.

Then runs the named gates — the BENCH_DETAIL expensive decile plus the KPI
quartet, verbatim through __spark_entry__.queries(), i.e. the exact code
the driver gates — at sf0.1 and at sf1, and prints per-gate wall times with
the growth factor. A gate whose growth factor is far above 10 has a hidden
super-linear step the sf0.1 bench could not see. Results are recorded in
PLANS.md §sf1.

Usage:
  python tools/sf1_validate.py build            # materialize sf1 (idempotent)
  python tools/sf1_validate.py run [names...]   # time gates at sf0.1 vs sf1
  python tools/sf1_validate.py all [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_BASE", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
MULT = 10
OFF = 100_000_000  # per-copy id shift; far above every sf1 natural key

# join-consistent key columns to shift, per table
KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    # region/nation: shared dims, copied verbatim
    "region": [],
    "nation": [],
}

# BENCH_DETAIL r5 expensive decile + the KPI quartet + the r6 additions
DEFAULT_GATES = [
    "vocab_bpe_merges",
    "dedup_keep_best",
    "streaming_stream_join",
    "graph_label_propagation",
    "graph_pagerank_parts",
    "dedup_semantic_clusters",
    "corpus_cluster_split",
    "dedup_ngram_jaccard",
    "txtable_acid_ops",
    "ann_lsh_topk",
    "dedup_incremental",
    "kpi_summary_month",
    "kpi_anomalies_mad",
    "kpi_delta_months",
    "kpi_rollup_by_nation",
]


def build(spark) -> None:
    marker = os.path.join(SF1_DIR, "_SF1_COMPLETE")
    if os.path.exists(marker):
        print(f"sf1: already built at {SF1_DIR}", file=sys.stderr)
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    for table, keys in KEY_COLS.items():
        src = spark.read.parquet(os.path.join(BASE, f"{table}.parquet"))
        out_path = os.path.join(SF1_DIR, f"{table}.parquet")
        if not keys:
            src.write.mode("overwrite").parquet(out_path)
            continue
        parts = [
            src.select(
                *[
                    (F.col(c) + i * OFF).alias(c) if c in keys else F.col(c)
                    for c in src.columns
                ]
            )
            for i in range(MULT)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # 32 files per table: realistic multi-task scans at local[32]
        out.repartition(32).write.mode("overwrite").parquet(out_path)
        print(f"sf1: wrote {table}", file=sys.stderr)
    with open(marker, "w") as fh:
        fh.write("ok\n")


def run(spark, names: list[str]) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown gates: {unknown}")
    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", BASE), ("sf1", SF1_DIR)):
        for name in names:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n_rows = len(qs[name](spark, sf_dir).collect())
            dt = round(time.perf_counter() - t0, 2)
            results.setdefault(name, {})[sf_label] = {"sec": dt, "rows": n_rows}
            print(f"{sf_label} {name}: {dt}s ({n_rows} rows)", file=sys.stderr)
    for name, r in results.items():
        s0, s1 = r["sf0.1"]["sec"], r["sf1"]["sec"]
        r["growth"] = round(s1 / s0, 1) if s0 > 0 else None
    return results


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:] or DEFAULT_GATES

    from payroll_etl_fastapi_spark.session import get_spark

    spark = get_spark("sf1-validate")
    spark.range(1000).selectExpr("sum(id)").collect()
    if cmd in ("build", "all"):
        build(spark)
    if cmd in ("run", "all"):
        results = run(spark, names)
        print(json.dumps({"multiplier": MULT, "gates": results}))


if __name__ == "__main__":
    main()
