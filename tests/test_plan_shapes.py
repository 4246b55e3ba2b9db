"""Physical-plan regression tests: the PLANS.md claims as assertions.

A correctness-preserving edit can silently turn a broadcast join into a
sort-merge join or lose a pushed filter; at 100 TB those are outages, not
style issues. These tests pin the plan shapes on the headline queries."""

from __future__ import annotations

import io
import re

import pytest
from contextlib import redirect_stdout

from payroll_etl_fastapi_spark.plans.suite import QUERIES
import payroll_etl_fastapi_spark.plans.suite_windows  # noqa: F401  (registers)
import payroll_etl_fastapi_spark.plans.suite_asof  # noqa: F401
import payroll_etl_fastapi_spark.plans.suite_similarity  # noqa: F401
import payroll_etl_fastapi_spark.plans.suite_text  # noqa: F401
import payroll_etl_fastapi_spark.plans.suite_relational  # noqa: F401
import payroll_etl_fastapi_spark.plans.suite_graph  # noqa: F401
import payroll_etl_fastapi_spark.plans.suite_dedup  # noqa: F401

from tests.conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_ORACLE)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str, label: str) -> int:
    """Count physical nodes by their detail headers — the tree section
    repeats every node, so a raw substring count double-counts."""
    return len(re.findall(rf"^\(\d+\) {label}", plan, flags=re.M))


def test_summary_pushes_range_filter_and_joins_nothing(spark):
    plan = _plan(spark, "kpi_summary_month")
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(l_shipdate", plan)
    assert re.search(r"PushedFilters:.*LessThan\(l_shipdate", plan)
    assert "Join" not in plan
    # column pruning: the scan must not read unreferenced wide columns
    assert "l_comment" not in plan


def test_rollup_broadcasts_all_dims(spark):
    plan = _plan(spark, "kpi_rollup_by_nation")
    assert _nodes(plan, "BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert re.search(r"PushedFilters:.*l_shipdate", plan)


def test_anomalies_topk_avoids_global_sort(spark):
    plan = _plan(spark, "kpi_anomalies_mad")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # med/mad scalars broadcast back


def test_topk_orders_is_take_ordered(spark):
    plan = _plan(spark, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    # scan reads only the three referenced columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
    }


def test_sessionization_single_user_exchange(spark):
    plan = _plan(spark, "events_sessionization")
    # window funcs + both aggregates reuse ONE hash partitioning on user_id:
    # exactly one shuffle over the events (AQE may add a final tiny exchange
    # for the output ordering)
    exchanges = re.findall(r"Arguments: hashpartitioning\(user_id", plan)
    assert len(exchanges) == 1


def test_asof_join_single_key_exchange_no_join_node(spark):
    plan = _plan(spark, "events_asof_join")
    # the union+window as-of plan must have exactly one shuffle on the join
    # key and NO join node at all — that is the whole point vs a range join
    exchanges = re.findall(r"Arguments: hashpartitioning\(user_id", plan)
    assert len(exchanges) == 1
    assert "Join" not in plan


def test_range_join_is_equality_join_not_nested_loop(spark):
    plan = _plan(spark, "events_range_join")
    # the bucket trick must keep this a hash-partitioned equality join; an
    # inequality-only condition would plan as BroadcastNestedLoopJoin (the
    # per-key cross product that dies at scale)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert _nodes(plan, "SortMergeJoin") + _nodes(plan, "BroadcastHashJoin") >= 1


def test_pack_sequences_distributed_prefix_sum(spark):
    import payroll_etl_fastapi_spark.plans.suite_corpus  # noqa: F401

    df = QUERIES["corpus_pack_sequences"](spark, SF_ORACLE)
    static = io.StringIO()
    with redirect_stdout(static):
        df.explain("formatted")
    plan = static.getvalue()
    # the corpus-wide cumsum must never be a single-partition window: the
    # doc-level running sum is partitioned by __pid (only the 32-row totals
    # frame may use an unpartitioned window)
    assert re.search(r"windowspecdefinition\(__pid", plan)
    # range partitioning on doc_id is the one corpus shuffle the design pays
    assert len(re.findall(r"Arguments: rangepartitioning\(doc_id", plan)) >= 1
    # at runtime AQE must REUSE that range exchange for the offsets side —
    # one corpus scan, and boundary consistency between cumsum and totals is
    # structural, not sampling-determinism luck
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_bm25_postings_generate_explodes_a_column_ref(spark):
    """The postings build must explode a MATERIALIZED token array: if the
    tokenize expression itself is the generator input's sibling, the regex
    re-runs once per output token (measured 8.9s -> 0.8s; PLANS.md
    "Explode-recompute audit"). The Generate node's input being a plain
    column reference is the load-bearing shape."""
    import io
    from contextlib import redirect_stdout

    from payroll_etl_fastapi_spark.operators.search import doc_term_freqs
    from payroll_etl_fastapi_spark.sources.registry import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    buf = io.StringIO()
    with redirect_stdout(buf):
        doc_term_freqs(docs).explain(True)
    plan = buf.getvalue()
    phys = plan.split("== Physical Plan ==")[1]
    assert re.search(r"Generate explode\(toks#\d+\)", phys), phys


def test_lm_score_plan_jvm_only_pruned_scan(spark):
    """unigram_lm_scores (text_lm_score gate): no Python execution nodes —
    the whole pipeline is codegen'd JVM expressions; the documents scan is
    pruned to (doc_id, text); the 1-row totals attach is a broadcast
    nested-loop (constant side), never a real cartesian."""
    plan = _plan(spark, "text_lm_score")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(
        c.split(":")[0] for c in m.group(1).split(",")
    ) == {"doc_id", "text"}


def test_dim_stats_plan_single_aggregate_pass(spark):
    """embedding_dim_stats: posexplode + ONE partial/final aggregate pair
    with exactly one exchange on the 64-key dim column — never a shuffle of
    whole vectors, never a Python node."""
    plan = _plan(spark, "embedding_dim_stats")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert _nodes(plan, "Generate") == 1
    # partial + final HashAggregate around a single shuffle
    assert _nodes(plan, "HashAggregate") == 2
    assert _nodes(plan, "Exchange") <= 2  # dim hash + final sort range


def test_txtable_merge_is_key_join_not_nested_loop(spark, tmp_path):
    """TxTable.merge plans as a shuffled/sort-merge FULL OUTER equality join
    on the keys — a nested-loop full-outer would be the 100 TB killer."""
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.sources.txtable import TxTable

    t = TxTable(spark, str(tmp_path / "m"))
    t.overwrite(spark.range(50_000).selectExpr("id", "id * 2 AS v"))
    src = spark.range(25_000, 75_000).selectExpr("id", "id * 3 AS v")
    # build the merge RESULT frame without committing: reproduce the plan
    # via a tiny merge on a copy, then inspect the committed join through
    # the public API by explaining the equivalent expression
    base = t.snapshot().withColumn("__t", F.lit(True))
    s = src.withColumn("__s", F.lit(True))
    joined = base.alias("t").join(s.alias("s"), ["id"], "full_outer")
    plan_df = joined.filter(F.col("__t").isNotNull() | F.col("__s").isNotNull())
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert re.search(r"SortMergeJoin .*FullOuter|ShuffledHashJoin .*FullOuter", plan)


def test_pq_adc_broadcasts_the_distance_table(spark):
    """ann_pq_adc_topk: the per-query (block, code) distance table attaches
    via BroadcastHashJoin (it is |queries|*m*k rows by construction) — a
    sort-merge join here would shuffle the full exploded code table; and
    the whole encode/ADC pipeline stays JVM-side."""
    plan = _plan(spark, "ann_pq_adc_topk")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert _nodes(plan, "SortMergeJoin") == 0
    assert "CartesianProduct" not in plan


def test_funnel_step_filters_reach_the_scans(spark):
    """Each funnel stage must read only its step's rows: the event_type
    equality predicate is pushed to every parquet scan, and no join in the
    chain is a nested loop (the only BNLJ is the 1-row denominator)."""
    plan = _plan(spark, "events_funnel_conversion")
    assert re.search(r"PushedFilters:.*EqualTo\(event_type,view\)", plan)
    assert re.search(r"PushedFilters:.*EqualTo\(event_type,click\)", plan)
    assert re.search(r"PushedFilters:.*EqualTo\(event_type,purchase\)", plan)
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") <= 1


def test_assoc_rules_is_take_ordered_no_cartesian(spark):
    plan = _plan(spark, "assoc_rules_parts")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "TakeOrderedAndProject") == 1
    # the basket self-join and both item-count attaches are equality joins
    assert _nodes(plan, "BroadcastNestedLoopJoin") <= 1  # 1-row total only


def test_prefix_filter_no_nested_loop_or_cartesian(spark):
    plan = _plan(spark, "dedup_prefix_filter_jaccard")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_hdr_gate_single_shuffle_no_sort_of_data(spark):
    """The sketch is one grouped count; quantiles fold a bounded array —
    the only Sort allowed is the 3-row presentation orderBy."""
    plan = _plan(spark, "sketch_hdr_quantiles")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "Window") == 0


def test_cdc_neardup_digest_join_no_cartesian_no_window(spark):
    """CDC near-dup: candidates come from ONE equality join on digest (plus
    the df-cap semi and the two size attaches); nothing may degrade to a
    cartesian/nested-loop, and no window — the fingerprint is mapInPandas,
    the rest grouped aggregates."""
    import payroll_etl_fastapi_spark.plans.suite_multimodal  # noqa: F401

    plan = _plan(spark, "multimodal_cdc_neardup")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert _nodes(plan, "Window") == 0


def test_rolling_hll_fans_out_registers_not_entities(spark):
    """The ×7 fan-out must sit ABOVE the register aggregation (explode of
    the ≤256-rows/day reduced set), never on the raw event scan, and the
    whole plan needs no window and no nested loop (the max-day bound rides
    a 1-row broadcast)."""
    plan = _plan(spark, "events_rolling_hll")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "Window") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") <= 2  # 1-row bound attach
    # explode(sequence(0,6)) appears after a HashAggregate in the tree:
    # the Generate node's child chain must contain an aggregate, which is
    # only true for the reduced-register frame (raw events see no explode)
    gen = re.search(r"^\(\d+\) Generate", plan, flags=re.M)
    assert gen is not None
    pre = plan[: gen.start()]
    assert "HashAggregate" in pre  # registers reduced before any fan-out


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """The 100 TB join-pruning mechanism: a month-partitioned fact joined to
    a filtered dim must plan a dynamicpruningexpression partition filter —
    only the dim's surviving months are scanned — and the pruned join must
    return exactly the plain join's rows."""
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMALL

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    d = str(tmp_path / "fact")
    li.withColumn(
        "ship_month", F.date_format("l_shipdate", "yyyy-MM")
    ).write.partitionBy("ship_month").parquet(d)
    fact = spark.read.parquet(d)
    # independent dim: March months only (filter NOT derivable from fact)
    dim = (
        fact.select("ship_month").distinct()
        .filter(F.substring("ship_month", 6, 2) == "03")
    )
    joined = fact.join(dim, "ship_month").groupBy("ship_month").agg(
        F.count(F.lit(1)).alias("n")
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower()
    got = {(r.ship_month, r.n) for r in joined.collect()}
    want = {
        (r.ship_month, r.n)
        for r in fact.filter(F.substring("ship_month", 6, 2) == "03")
        .groupBy("ship_month")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_nested_schema_pruning_reads_only_meta_subfield(spark, tmp_path):
    """A metadata-only query over the media table must prune the parquet
    ReadSchema down to the single struct subfield it touches — at 100 TB
    of media, reading meta.width must never drag the payload bytes or the
    rest of the meta struct through the scan."""
    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import multimodal as MM

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d = str(tmp_path / "media")
    MM.media_from_documents(docs).write.parquet(d)
    media = spark.read.parquet(d)
    q = media.select(F.col("meta.width").alias("w")).filter(F.col("w").isNull())

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"ReadSchema: (.+)", plan)
    assert m, plan
    schema = m.group(1)
    assert "width" in schema
    assert "payload" not in schema  # binary column never read
    assert "mime" not in schema and "duration_ms" not in schema  # struct pruned


def test_containment_equality_join_no_cartesian(spark):
    """The containment intersection comes from ONE equality join on the
    df-capped shingle key — never a cross/nested-loop join — and the only
    windows are none at all."""
    plan = _plan(spark, "dedup_containment")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 0
    assert _nodes(plan, "Window") == 0


def test_linkage_blocks_are_equality_joins(spark):
    """Record-linkage candidates come from equality joins on the block
    keys; the Levenshtein verify runs on candidates only (filter above the
    join), never as a join condition that would force nested loops."""
    plan = _plan(spark, "linkage_blocked_names")
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "BroadcastNestedLoopJoin") == 0


def test_interval_merge_single_exchange_on_key(spark):
    """Both window passes and the island aggregate of the interval merge
    reuse ONE hash partitioning on user_id: exactly one shuffle of the
    interval frame (plus the presentation sort's range exchange)."""
    plan = _plan(spark, "events_interval_merge")
    assert _nodes(plan, "CartesianProduct") == 0
    ex = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    hashparts = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(ex) <= 2  # one hash (windows+agg), one range (orderBy)
    assert len(hashparts) >= 1


def test_linear_fit_is_one_scan_one_exchange(spark):
    """quality_linear_fit's whole training pass must be a single aggregation
    pipeline: one parquet scan (text column only), one partial/final
    HashAggregate pair around ONE single-partition exchange, and no join,
    sort, or second scan — the shape that makes the fit a 100 TB one-pass
    operator. The Cramer solve and R² are projections over the 1-row
    aggregate and must not add exchanges."""
    import payroll_etl_fastapi_spark.plans.suite_quality  # noqa: F401

    plan = _plan(spark, "quality_linear_fit")
    assert _nodes(plan, "Scan parquet") == 1
    assert "ReadSchema: struct<text:string>" in plan
    assert _nodes(plan, "Exchange") == 1
    assert _nodes(plan, "HashAggregate") == 2  # partial + final
    for forbidden in ("Join", "Sort", "Window"):
        assert _nodes(plan, forbidden) == 0, forbidden


def test_packed_pq_index_is_pure_projection_and_broadcast_search(spark):
    """round 8: pq_pack_codes must be a single-scan pure projection (no
    exchange, no Python eval) — the 100 TB encode-and-store path; and the
    packed ADC search must join the melted bytes against a BROADCAST
    per-query table (never shuffle the corpus side for the table)."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from payroll_etl_fastapi_spark.operators import pq as PQ

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    books = PQ.pq_codebooks_random(4, 8, 64)
    packed = PQ.pq_pack_codes(PQ.pq_encode(emb, books), m=4)
    buf = _io.StringIO()
    with _rs(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, "Exchange") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert _nodes(plan, r"Scan parquet") == 1

    queries = emb.filter("vec_id < 3")
    buf = _io.StringIO()
    with _rs(buf):
        PQ.pq_adc_topk_packed(packed, queries, books, k=5).explain("formatted")
    splan = buf.getvalue()
    assert _nodes(splan, "BroadcastHashJoin") >= 1
    assert "BatchEvalPython" not in splan and "ArrowEvalPython" not in splan


def test_l2_topk_broadcasts_queries_single_window(spark):
    """round 8: the exact-L2 truth baseline must broadcast the query side
    (one corpus scan, no corpus shuffle before scoring) and rank through
    exactly one window exchange — the cosine_topk shape."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F
    from payroll_etl_fastapi_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter("vec_id < 3")
    buf = _io.StringIO()
    with _rs(buf):
        sim.l2_topk(emb, queries, 5).explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, "BroadcastNestedLoopJoin") >= 1 or _nodes(
        plan, "BroadcastHashJoin"
    ) >= 1
    # exactly one ranking window; the bare-word pattern excludes the
    # WindowGroupLimit pushdown nodes Spark 4 adds around it
    assert _nodes(plan, r"Window\b(?!GroupLimit)") == 1


def test_refine_topk_broadcasts_shortlist_and_queries(spark):
    """round 8: the exact re-rank tail must reach the corpus through a
    BROADCAST join on the shortlist ids (one pruned corpus scan — never a
    corpus shuffle or cartesian) and attach query vectors by a second
    broadcast; ranking is one window over |queries|*k' rows."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F
    from payroll_etl_fastapi_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.filter("vec_id < 3")
    short = (
        emb.filter("vec_id < 40")
        .crossJoin(queries.select(F.col("vec_id").alias("query_id")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    buf = _io.StringIO()
    with _rs(buf):
        sim.refine_topk(emb, short, queries, k=5).explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, "BroadcastHashJoin") >= 2
    assert _nodes(plan, "CartesianProduct") == 0
    assert _nodes(plan, "SortMergeJoin") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_contamination_broadcasts_bench_side(spark):
    """round 8: the two-table decontamination must broadcast the benchmark
    band rows AND the benchmark vectors — the 100 TB corpus side is never
    shuffled by value (only candidate (id, bench_id) pairs exchange)."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F
    from payroll_etl_fastapi_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    bench = emb.filter("vec_id % 23 = 5").select(
        (F.col("vec_id") + 1000000).alias("bench_id"), "embedding"
    )
    buf = _io.StringIO()
    with _rs(buf):
        sim.semantic_contamination(emb, bench, 0.8).explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, "BroadcastHashJoin") >= 2
    assert _nodes(plan, "CartesianProduct") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sq8_encode_pure_projection_search_no_python(spark):
    """round 8: SQ8 encode must be a single-scan pure projection (the
    store-once path), and search must stay JVM-side with the query side
    broadcast (BroadcastNestedLoopJoin over the tiny query set — the
    guarded l2_topk shape, scanning only the byte index)."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from payroll_etl_fastapi_spark.operators import pq as PQ

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    bounds = PQ.sq8_train_bounds(emb, 64)
    packed = PQ.sq8_encode_packed(emb, bounds)
    buf = _io.StringIO()
    with _rs(buf):
        packed.explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, "Exchange") == 0
    assert _nodes(plan, r"Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    queries = emb.filter("vec_id < 3")
    buf = _io.StringIO()
    with _rs(buf):
        PQ.sq8_topk(packed, queries, bounds, k=5).explain("formatted")
    splan = buf.getvalue()
    assert "Broadcast" in splan
    assert "BatchEvalPython" not in splan and "ArrowEvalPython" not in splan


def test_dhash_pairs_no_cartesian_and_no_python(spark):
    """round 9: perceptual near-dup candidates must come from the banded
    EQUALITY join (never a cartesian/nested-loop pair scan), and the whole
    fingerprint+verify pipeline stays JVM-side."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import multimodal as MM

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    media = MM.media_from_documents(docs).withColumn(
        "meta",
        F.struct(
            F.col("meta.mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.col("meta.duration_ms"),
        ),
    )
    buf = _io.StringIO()
    with _rs(buf):
        MM.dhash_neardup_pairs(media).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ks_drift_single_rollup_and_window(spark):
    """round 9: KS drift = one grouped rollup feeding one per-key prefix
    window — no joins against the raw table, no Python."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import quality as Q

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("is_a"),
        (F.col("event_id") % 7).alias("bin"),
    )
    buf = _io.StringIO()
    with _rs(buf):
        Q.ks_drift(ev, ["event_type"], "is_a", "bin").explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, r"Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_psi_drift_single_rollup_and_window(spark):
    """round 10: PSI drift rides the same single-scan shape as KS — one
    grouped rollup feeding one per-key full-frame window, no joins against
    the raw table, no Python."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators import quality as Q

    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet").select(
        "event_type",
        (F.col("event_id") % 2 == 0).alias("is_a"),
        (F.col("event_id") % 7).alias("bin"),
    )
    buf = _io.StringIO()
    with _rs(buf):
        Q.psi_drift(ev, ["event_type"], "is_a", "bin").explain("formatted")
    plan = buf.getvalue()
    assert _nodes(plan, r"Scan parquet") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_exchange_free_top_n(spark):
    """round 10: the corpus-wide weighted selection compiles to a
    TakeOrderedAndProject over one pruned scan — ZERO exchanges, no
    corpus-wide window, no Python."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import functions as F

    from payroll_etl_fastapi_spark.operators.corpus import weighted_sample

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    buf = _io.StringIO()
    with _rs(buf):
        weighted_sample(docs, 50, F.col("n_chars")).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert _nodes(plan, r"Exchange") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_facade_pipeline_no_cartesian_no_python(spark, monkeypatch):
    """round 11 (fixed per ADVICE r11 medium): the driver-gated facade
    composition (pipeline_facade_v3) — two banded dedup self-joins,
    chunking, shard layout — compiles with NO CartesianProduct/
    BroadcastNestedLoopJoin anywhere (both dedup stages are (band, sig)
    equality joins; the corpus is never broadcast as a retrieval query
    side would be) and no Python evaluation in the plan.

    The boundary localCheckpoints are monkeypatched to identity for the
    inspection (the test_similarity convention): a materialized checkpoint
    rewrites upstream stages to `Scan ExistingRDD`, so the r11 assertion
    only ever saw the post-chunk tail — a crossJoin upstream of a lazy
    checkpoint was empirically invisible to it."""
    import io as _io
    from contextlib import redirect_stdout as _rs

    from pyspark.sql import DataFrame

    import __spark_entry__ as entry_mod

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    df = entry_mod.queries()["pipeline_facade_v3"](spark, SF_ORACLE)
    buf = _io.StringIO()
    with _rs(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the full pre-checkpoint composition is now visible end to end — the
    # banded self-joins must appear as real joins in the inspected text
    assert _nodes(plan, r"\bSortMergeJoin|\bBroadcastHashJoin|\bShuffledHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
