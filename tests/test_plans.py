"""Physical-plan audits (SURVEY.md §7 M7): the plan each query produces is
part of the contract — a correct result from a wrong-shaped plan (missed
broadcast, unpushed filter, accidental cartesian) is a 100 TB outage that a
row-count check can't see. These tests pin the shapes.

Plans are inspected via ``df.explain`` output only — nothing executes.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from simple_pos_kafka_pyspark_airflow_spark.plans import load_registry

REGISTRY = load_registry()


def explain_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def build(spark, sf_dir, name):
    return REGISTRY[name].build(spark, sf_dir)


def test_broadcast_join_is_broadcast(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_join_broadcast"))
    assert "BroadcastHashJoin" in plan, plan


def test_tpch_q5_broadcasts_dims(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_tpch_q5"))
    assert "BroadcastHashJoin" in plan, plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_filter_date"))
    assert "PushedFilters: [" in plan
    # the shipdate range predicate must appear inside PushedFilters, not
    # only in a post-scan Filter node
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), plan


def test_column_pruning_in_read_schema(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_project"))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read, plan
    # q_project selects 3 customer columns; the scan must not read others
    assert "c_acctbal" not in read[0], read[0]


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_topk"))
    assert "TakeOrderedAndProject" in plan, plan


def _window_above_semijoin(plan: str) -> bool:
    """True when the (single) Window node sits ABOVE the LeftSemi join in
    the printed tree — i.e. the semi-join filters the window's INPUT. A
    tree prints parents before children, so textual order is depth order."""
    w, j = plan.find("Window"), plan.find("LeftSemi")
    return w != -1 and j != -1 and w < j


def test_tpch_q17_filters_before_window(spark, sf_dir):
    """VERDICT r7 item 2: the brand filter commutes with the per-partkey
    window average, so the semi-join to branded partkeys must run BELOW
    the window — the window sort touches the ~1/25 branded slice, never
    the whole fact table. Regression = Window printed below the join."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q17"), mode="simple")
    assert _window_above_semijoin(plan), plan


def test_tpch_q2_filters_before_window(spark, sf_dir):
    """Same commute in Q2 (VERDICT r7 item 4): the part size/type filter
    restricts the window's partition key set, so the min-cost window runs
    over only the surviving partkeys' supply rows."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q2"), mode="simple")
    assert _window_above_semijoin(plan), plan


def test_agg_has_partial_final_pair(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_agg_sum"))
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_whole_stage_codegen_present(spark, sf_dir):
    # formatted mode hides codegen stages under AQE (isFinalPlan=false);
    # codegen mode compiles the stages regardless
    plan = explain_str(build(spark, sf_dir, "q_tpch_q1"), mode="codegen")
    assert "WholeStageCodegen subtrees" in plan, plan[:500]
    assert "Found 0" not in plan.splitlines()[1], plan[:500]


def test_tpch_q8_dims_broadcast_facts_not(spark, sf_dir):
    """Q8's 7-table join: part/nation/region ride broadcasts; no
    sort-merge join should appear at contract scale (facts hash-join)."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q8"))
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_tpch_q2_min_via_window_not_self_join(spark, sf_dir):
    """The correlated-MIN rewrite must be a window over ps_partkey, not a
    second aggregate+join pass over the supply relation."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q2"))
    assert "Window" in plan, plan
    # one supply derivation, not two: lineitem appears in exactly one scan
    scans = [ln for ln in plan.splitlines() if "lineitem.parquet" in ln and "Location" in ln]
    assert len(scans) == 1, plan


def test_tpch_q4_exists_becomes_semi_join(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_tpch_q4"))
    assert "LeftSemi" in plan, plan


def test_tpch_q21_single_lineitem_aggregation(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS pair is algebrized into one per-order
    aggregation: exactly ONE lineitem scan, no semi/anti joins, and the
    o_orderstatus filter pushed to the orders scan."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q21"))
    scans = [ln for ln in plan.splitlines() if "lineitem.parquet" in ln and "Location" in ln]
    assert len(scans) == 1, plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "o_orderstatus" in ln]
    assert pushed, plan


def test_tpch_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    plan = explain_str(build(spark, sf_dir, "q_tpch_q22"))
    assert "LeftAnti" in plan, plan
    # the AVG threshold joins as a broadcast of a 1-row aggregate
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_tpch_q19_pushes_part_predicates(spark, sf_dir):
    """The disjunctive brand/size predicate must not defeat pushdown of
    the per-table conjuncts Catalyst can extract."""
    plan = explain_str(build(spark, sf_dir, "q_tpch_q19"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "p_brand" in ln]
    assert pushed, plan


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product_anywhere(spark, sf_dir, name):
    """CartesianProduct is never acceptable — tiny×tiny cross joins must go
    through BroadcastNestedLoopJoin (q_join_cross broadcasts explicitly)."""
    plan = explain_str(build(spark, sf_dir, name), mode="simple")
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


def test_plan_summary_counts_features(spark, sf_dir):
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_tpch_q5"))
    assert s["broadcast_joins"] >= 2
    assert s["cartesian_products"] == 0
    assert s["scans"] >= 6
    assert s["scans_with_pushed_filters"] >= 2
    assert "lineitem.parquet" in s["tables"]


def test_redact_and_decode_are_map_only(spark, sf_dir):
    """Per-row corpus passes must not shuffle: redaction and multimodal
    decode are single-scan, zero-exchange plans at any scale."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    for name in ("q_text_redact", "q_multimodal_decode", "q_multimodal_audio"):
        s = plan_summary(build(spark, sf_dir, name))
        assert s["exchanges"] == 0, (name, s)
        assert s["scans"] == 1, (name, s)


def test_pack_sequences_bounded_exchanges(spark, sf_dir):
    """Sequence packing is one window over the split shards: one scan,
    no joins, and at most two exchanges (shard hash + AQE final)."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_pack_sequences"))
    assert s["scans"] == 1 and s["windows"] == 1, s
    assert s["exchanges"] <= 2, s
    assert s["cartesian_products"] == 0, s


def test_embed_normalize_single_group_shuffle(spark, sf_dir):
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_embed_normalize"))
    assert s["scans"] == 1 and s["exchanges"] <= 2, s


def test_quality_rules_is_map_only(spark, sf_dir):
    """The Gopher-style stat gate is a single projection pass — any
    Exchange in its plan means a rule accidentally aggregated."""
    plan = explain_str(build(spark, sf_dir, "q_quality_rules"))
    assert "Exchange" not in plan, plan


def test_ngram_topk_take_ordered_single_exchange(spark, sf_dir):
    """Corpus n-gram top-k: one partial/final count exchange, then
    TakeOrderedAndProject — never a global Sort."""
    plan = explain_str(build(spark, sf_dir, "q_text_ngram_topk"))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("+- Exchange") <= 1, plan


def test_span_dedup_broadcasts_boilerplate(spark, sf_dir):
    """Span dedup must broadcast the (tiny) boilerplate digest set back
    against segment rows — a shuffle join there would re-shuffle the whole
    segmented corpus a third time."""
    plan = explain_str(build(spark, sf_dir, "q_text_dedup_spans"))
    assert "BroadcastHashJoin" in plan, plan


def test_source_cap_pushes_window_group_limit(spark, sf_dir):
    """q_sample_source_cap's rank ≤ cap filter must plan WindowGroupLimit
    on both sides of the exchange (Spark 3.5 rank-limit pushdown): each
    input partition forwards at most cap rows per group, so the shuffle is
    O(partitions·groups·cap) and no task sorts a mega-domain's full group.
    A bare Window + Filter here means the pushdown regressed — a skew
    outage at 100 TB."""
    plan = explain_str(build(spark, sf_dir, "q_sample_source_cap"))
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_ngram_leak_distinct_grams_before_join(spark, sf_dir):
    """q_split_ngram_leak must never build gram rows from the occurrence
    stream: both sides explode array_distinct(grams) (gram SETS), and the
    probe/test side — orders of magnitude smaller by the split — is the
    broadcast or build side, so the corpus side joins without shuffling
    its gram rows at this SF."""
    plan = explain_str(build(spark, sf_dir, "q_split_ngram_leak"))
    assert "array_distinct" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_ngram_leak_hot_gram_cap_aggregates_map_side(spark, sf_dir):
    """The hot-gram cap's per-gram corpus count must be a partial+final
    hash aggregate pair (map-side combine), never a single-pass aggregate
    or a window: a hot gram's occurrence rows must combine per partition
    BEFORE the exchange, or the count stage itself becomes the straggler
    the cap exists to prevent."""
    plan = explain_str(build(spark, sf_dir, "q_split_ngram_leak"))
    assert "partial_count" in plan or "Partial" in plan, plan
    assert "Window" not in plan, plan


def test_dedup_canonical_single_digest_shuffle(spark, sf_dir):
    """Canonical dedup must keep exact dedup's shape: one hash exchange on
    the digest of the normalized form — normalization happens in the scan
    projection, adding zero exchanges."""
    plan = explain_str(build(spark, sf_dir, "q_dedup_canonical"), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dedup_intra_no_window_no_cross_doc_join(spark, sf_dir):
    """Within-doc repetition removal must stay an aggregate pipeline: no
    Window operator (would buffer whole docs per task and lose map-side
    combine), no broadcast/nested-loop join (would mean a cross-document
    comparison crept in) — its only join is the left join back to the
    full doc list."""
    plan = explain_str(build(spark, sf_dir, "q_text_dedup_intra"))
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sample_temperature_broadcasts_rates(spark, sf_dir):
    """The derived keep-rates table is group-cardinality-sized and must
    broadcast back over the documents scan — a shuffle join on source
    would move the corpus to join against a handful of rows. The mixture
    aggregation itself must carry map-side partial aggregation."""
    plan = explain_str(build(spark, sf_dir, "q_sample_temperature"))
    assert "BroadcastHashJoin" in plan, plan
    assert "partial" in plan.lower(), plan


def test_embed_drift_no_window_two_sides(spark, sf_dir):
    """The drift monitor is two partial-aggregable posexplode+groupBy
    pipelines joined on the dimension — never a window, never a
    cartesian; the post-exchange state is O(dim)."""
    plan = explain_str(build(spark, sf_dir, "q_embed_drift"))
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate posexplode" in plan or "posexplode" in plan, plan


def test_simsearch_batch_bounded_shuffle(spark, sf_dir):
    """q_simsearch_batch: the per-query top-k window must ride the rank-limit
    pushdown — WindowGroupLimit Partial ahead of the exchange and Final after
    it — so the shuffle carries n_partitions×n_queries×k rows, never the full
    O(corpus × n_queries) scored cross product. The query side must arrive by
    broadcast (nested-loop: tiny build side, no shuffle of the corpus)."""
    plan = explain_str(build(spark, sf_dir, "q_simsearch_batch"))
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_anomaly_zscore_broadcasts_group_moments(spark, sf_dir):
    """q_anomaly_zscore: the per-group moment table (group-cardinality rows)
    must broadcast back over the fact scan — a whole-corpus window or a
    shuffle join on event_type would funnel each group through one reducer."""
    plan = explain_str(build(spark, sf_dir, "q_anomaly_zscore"))
    assert "BroadcastHashJoin" in plan, plan


def test_simsearch_topk_zero_shuffle(spark, sf_dir):
    """The exact-cosine baseline is one scan + TakeOrderedAndProject:
    per-partition k-heaps merged on the driver, zero exchanges — any
    shuffle here means the scorer or the top-k regressed."""
    plan = explain_str(build(spark, sf_dir, "q_simsearch_topk"), mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_dedup_exact_single_digest_shuffle(spark, sf_dir):
    """Exact dedup shuffles once, on the sha digest — never the text and
    never twice (a second exchange would mean the dedup re-partitioned)."""
    plan = explain_str(build(spark, sf_dir, "q_dedup_exact"), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_tfidf_single_broadcast_hint(spark, sf_dir):
    """The round-2 scale flaw was a FORCED broadcast of the
    vocabulary-sized document-frequency table. Exactly one broadcast hint
    may exist in q_text_tfidf's logical plan — the 1-row n_docs scalar;
    a second hint means the vocabulary broadcast crept back (the planner
    may still broadcast small sides at tiny SFs on its own, which is fine
    and not what this pins)."""
    df = build(spark, sf_dir, "q_text_tfidf")
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1, analyzed


def test_bloom_flag_single_doc_exchange_no_gram_shuffle(spark, sf_dir):
    """bloom_flag (the corpus side of q_split_bloom) must shuffle exactly
    once — the per-document verdict reduce — and the exchange key must be
    the document id, never the gram: a gram-keyed exchange is precisely
    the cost the Bloom tier exists to delete. The membership probe must
    be an Arrow batch (vectorized gather), not a row-at-a-time UDF."""
    import numpy as np

    from simple_pos_kafka_pyspark_airflow_spark.llm import bloom

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = bloom.bloom_flag(docs, np.zeros(1 << 17, dtype=np.uint8))
    plan = explain_str(df, mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert "_gram" not in plan.split("Exchange")[1].split("\n")[0], plan
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan, plan


def test_ivf_batch_rank_limit_and_cell_broadcast(spark, sf_dir):
    """cosine_topk_ivf_batch (inside q_simsearch_recall): the probe-pairs
    frame must arrive by broadcast on the cell key (at scale that join is
    partition pruning against the cell-partitioned store — a shuffle join
    would re-shuffle the corpus on cell), and the per-query top-k must
    ride the rank-limit pushdown (WindowGroupLimit on both sides of the
    exchange) so only n_partitions×n_queries×k scored rows shuffle."""
    from pyspark.sql import functions as F

    from simple_pos_kafka_pyspark_airflow_spark.llm import simsearch

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = (
        e.orderBy("vec_id")
        .limit(2)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    )
    plan = explain_str(
        simsearch.cosine_topk_ivf_batch(e, qs, k=5, n_cells=4, nprobe=2)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("WindowGroupLimit") >= 2, plan


def test_shard_store_join_gets_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A join against the shard-partitioned store on the partition key
    must plan a dynamicpruning PartitionFilter: the dim side's filter
    result prunes fact partitions AT RUNTIME, so a 100 TB shard store
    joined to a filtered manifest reads only the matching shards. A plain
    isnotnull-only PartitionFilters line here means DPP regressed and the
    join scans every shard."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shard = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(16)).cast("int")
    store = str(tmp_path / "store")
    d.withColumn("shard", shard).write.partitionBy("shard").parquet(store)
    fact = spark.read.parquet(store)
    manifest = (
        spark.range(16)
        .select(F.col("id").cast("int").alias("shard"))
        .where(F.col("shard") % 4 == 0)
    )
    plan = explain_str(fact.join(manifest, "shard"))
    assert "dynamicpruning" in plan.lower(), plan


def test_join_bucketed_zero_exchange(spark, sf_dir):
    """The bucketed fact-to-fact join must carry NO exchange anywhere
    below the aggregation: both scans read 8-way bucketed managed tables
    on the join key, so the merge join consumes the write-time
    partitioning directly — the write paid the shuffle once
    (sources/io.write_bucketed_table), every query on the key amortizes
    it. q_join_bucketed's final groupBy is allowed its one aggregation
    exchange; the JOIN subtree is pinned shuffle-free here."""
    from simple_pos_kafka_pyspark_airflow_spark.plans.queries_joins import (
        bucketed_join_frame,
    )

    j = bucketed_join_frame(spark, sf_dir)
    plan = explain_str(j)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the full contract query adds exactly the aggregation exchange
    # (formatted mode names nodes bare — "Exchange (10)" — with the
    # hashpartitioning detail in the arguments section)
    full = explain_str(build(spark, sf_dir, "q_join_bucketed"))
    assert full.count("- Exchange") == 1, full


def test_source_overlap_sketch_single_scan_no_shingle_join(spark, sf_dir):
    """The production overlap audit must be ONE corpus scan feeding the
    128-wide min-agg, with the only join the S²-pair compare over the
    tiny per-source signature table (broadcast NL, S ~ handful of rows)
    — never a sort-merge self-join on the shingle vocabulary (that is
    the certification-only q_source_overlap's exact arm)."""
    import re

    plan = explain_str(build(spark, sf_dir, "q_source_overlap_sketch"))
    # the persisted signature table is shared by both join sides, so the
    # tree prints the SAME scan node twice — count distinct node ids
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) == 1, plan
    assert plan.count("InMemoryTableScan") >= 2, plan  # both sides reuse it
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_pack_contiguous_bounded_exchanges(spark, sf_dir):
    """Boundary-preserving packing: one scan, one window (per-stream
    prefix sum), at most two exchanges (stream hash + aggregation) —
    and never an empty-frame global window (the serialize-the-corpus
    shape the stream split exists to prevent)."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_pack_contiguous"))
    assert s["scans"] == 1 and s["windows"] == 1, s
    assert s["exchanges"] <= 2, s
    plan = explain_str(build(spark, sf_dir, "q_pack_contiguous"))
    win = [ln for ln in plan.splitlines() if "Arguments" in ln and "windowspecdefinition" in ln]
    assert any("stream" in ln for ln in win), plan


def test_observed_metrics_flow_with_single_action(spark):
    """observed(): stage metrics ride the action that materializes the
    plan — no second scan, no extra job. A gated pipeline reports
    rows-through and a drop-side aggregate while the action computes its
    own result (the 100 TB per-stage observability pattern)."""
    from pyspark.sql import functions as F

    from simple_pos_kafka_pyspark_airflow_spark.analyze import observed

    base = spark.range(1_000).withColumn("v", F.col("id") % 7)
    gated, gate_obs = observed(
        base.where("id >= 100"),
        "gate",
        rows=F.count(F.lit(1)),
        sum_v=F.sum("v"),
        nulls=F.count_if(F.col("v").isNull()),
    )
    agged, agg_obs = observed(
        gated.groupBy("v").count(), "post_agg", groups=F.count(F.lit(1))
    )
    result = {r["v"]: r["count"] for r in agged.collect()}
    assert sum(result.values()) == 900
    m = gate_obs.get
    assert m["rows"] == 900 and m["nulls"] == 0
    assert m["sum_v"] == sum(i % 7 for i in range(100, 1000))
    assert agg_obs.get["groups"] == 7


def test_tpch_heavy_shapes_stay_broadcast_and_bounded(spark, sf_dir):
    """Q9/Q17/Q18/Q20 — the classic shuffle-heavy TPC-H shapes where a
    bad plan hides (r6 verdict). Pins, at contract scale: dims ride
    broadcasts (zero sort-merge joins), the per-part AVG in Q17 is a
    window (one lineitem pass, not an agg+self-join), Q18/Q20's
    correlated EXISTS are semi-joins, and total exchange counts stay at
    the aggregation-only minimum for each query."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    expectations = {
        "q_tpch_q9": dict(max_exchanges=2, min_broadcast=4, windows=None, semi=False),
        # r8: the brand filter now semi-joins BELOW the window (VERDICT r7
        # item 2), so Q17 carries exactly one LeftSemi
        "q_tpch_q17": dict(max_exchanges=2, min_broadcast=1, windows=1, semi=True),
        "q_tpch_q18": dict(max_exchanges=2, min_broadcast=3, windows=None, semi=True),
        "q_tpch_q20": dict(max_exchanges=4, min_broadcast=4, windows=None, semi=True),
    }
    for name, want in expectations.items():
        df = build(spark, sf_dir, name)
        s = plan_summary(df)
        assert s["sort_merge_joins"] == 0, (name, s)
        assert s["broadcast_joins"] >= want["min_broadcast"], (name, s)
        assert s["exchanges"] <= want["max_exchanges"], (name, s)
        if want["windows"] is not None:
            assert s["windows"] == want["windows"], (name, s)
        plan = explain_str(df)
        assert ("LeftSemi" in plan) == want["semi"], (name, plan[:800])


def test_ohlc_single_exchange_no_window(spark, sf_dir):
    """OHLC bars must be ONE partial-aggregable groupBy: a single
    exchange, zero window/sort operators (the first/last-over-window
    formulation would sort every partition for the same answer), and a
    partial/final aggregate pair carrying six numbers per bar."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    df = build(spark, sf_dir, "q_ohlc")
    s = plan_summary(df)
    assert s["exchanges"] == 1 and s["windows"] == 0, s
    # min_by against a STRING order key is a varlen aggregation buffer →
    # Spark plans SortAggregate (the q_sample_weighted gotcha); the
    # partial/final pair is what certifies map-side combine
    plan = explain_str(df)
    aggs = sum(plan.count(n) for n in ("HashAggregate", "ObjectHashAggregate", "SortAggregate"))
    assert aggs >= 2, plan


def test_countmin_probe_is_broadcast(spark, sf_dir):
    """The CMS estimate join must broadcast the sketch side (≤ depth·width
    rows by construction) — a shuffle join here would defeat the sketch's
    entire point at scale."""
    plan = explain_str(build(spark, sf_dir, "q_sketch_countmin"))
    assert "BroadcastHashJoin" in plan, plan


def test_skyline_distinct_points_then_semi_join(spark, sf_dir):
    """The skyline sort-scan runs over the DISTINCT (keys, x, y) point
    set (one distinct-agg exchange + one window exchange shared by the
    three window ops), and the surviving front semi-joins back to the
    fact — never a dominance self-join (no cartesian product; exactly
    one join, the front probe, which broadcasts here)."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_skyline"))
    assert s["exchanges"] == 2, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 1, s
    assert s["cartesian_products"] == 0, s


def test_skyline_global_front_duplicated_points(spark):
    """``partition=None`` (the global front, the r8-verdict caution):
    the window sorts only the DISTINCT point set, and duplicated (x, y)
    rows — mutually non-dominated — must ALL survive the semi-join back,
    both on and off the front."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.order import skyline_2d

    rows = [
        # front points, each duplicated
        (1, 10, 1), (2, 10, 1), (3, 5, 5), (4, 5, 5), (5, 1, 10),
        # dominated points, one duplicated pair
        (6, 4, 4), (7, 4, 4), (8, 1, 1),
    ]
    df = spark.createDataFrame(rows, "id int, x int, y int")
    got = sorted(
        r["id"] for r in skyline_2d(df, F.col("x"), F.col("y")).collect()
    )
    assert got == [1, 2, 3, 4, 5], got


def test_rolling_distinct_sketch_broadcasts_day_side(spark, sf_dir):
    """The sketch form's trailing-window merge is a range join between
    two DAY-cardinality sides; the hinted day-list side must broadcast.
    With group_cols present (the contract query groups by event_type)
    Catalyst extracts the group equality as hash keys and keeps the
    window interval as a residual condition — a BroadcastHashJoin, the
    best possible shape; without group cols it degrades to a (still
    bounded-side) BroadcastNestedLoopJoin. Never a CartesianProduct,
    never a shuffle join of the sketch blobs."""
    plan = explain_str(build(spark, sf_dir, "q_rolling_distinct_sketch"))
    assert "INTERVAL" in plan and (
        "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    ), plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_rolling_distinct_sketch_bare_range_join_broadcasts(spark):
    """The OPERATOR with group_cols=None — pure range condition, no
    equi keys — must still broadcast the bounded day side: a
    BroadcastNestedLoopJoin with the hinted right side on the build
    side, never a CartesianProduct."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.windows import (
        rolling_distinct_sketch,
    )

    df = spark.createDataFrame(
        [("2024-01-0%d" % (i % 9 + 1), i) for i in range(20)],
        "d string, user_id int",
    ).select(F.col("d").cast("timestamp").alias("ts"), "user_id")
    plan = explain_str(rolling_distinct_sketch(df, "ts", "user_id", 7))
    assert "BroadcastNestedLoopJoin Inner BuildRight" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ks_drift_no_joins_two_exchanges(spark, sf_dir):
    """KS rides per-(group, value) counts + per-group windows: one count
    shuffle + one window exchange, zero joins — the sup-difference never
    materializes a pair or a cross-side join."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_drift_ks"))
    assert s["exchanges"] <= 2, s
    assert s["sort_merge_joins"] == 0 and s["broadcast_joins"] == 0, s
    assert s["scans"] == 1, s


def test_weighted_sample_take_ordered_then_tiny_window(spark, sf_dir):
    """The md5 min-stable sampler must do the global selection with
    TakeOrderedAndProject (k rows per partition move) and collapse every
    doc's units map-side BEFORE the exchange — the single-partition
    row_number window only ever sees the k selected rows."""
    plan = explain_str(build(spark, sf_dir, "q_sample_weighted"))
    assert "TakeOrderedAndProject" in plan, plan
    # min over md5 STRINGS is a varlen buffer -> Spark plans SortAggregate;
    # the partial/final pair is what matters (digests collapse pre-shuffle)
    assert plan.count("SortAggregate") + plan.count("HashAggregate") >= 2, plan


def test_sketch_shards_partial_sketch_before_exchange(spark, sf_dir):
    """Per-shard HLL build must be a partial/final ObjectHashAggregate
    pair — the shuffle carries sketch bytes per shard, never the custkey
    column — and the certification-only exact arm is the ONLY reason a
    second orders scan appears (documented in the query notes)."""
    plan = explain_str(build(spark, sf_dir, "q_sketch_shards"))
    assert plan.count("ObjectHashAggregate") >= 2, plan


def test_session_native_single_shuffle(spark, sf_dir):
    """Native session windows: one exchange on the grouping key, then the
    session merge — no extra sort-based global pass."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_window_session_native"))
    assert s["scans"] == 1 and s["exchanges"] <= 1, s


def test_bloom_join_prefilter_below_join(spark, sf_dir):
    """q_join_bloom's whole point: the Arrow-batched Bloom membership
    filter sits BELOW the semi join, so only survivors reach the join's
    exchange — the plan must show the Python-eval filter stage and the
    semi join above it, never a cartesian."""
    plan = explain_str(build(spark, sf_dir, "q_join_bloom"))
    assert "ArrowEvalPython" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the filter must be under the join: the ArrowEvalPython node appears
    # in the fact-side subtree, i.e. before the first join node top-down
    join_pos = plan.index("LeftSemi")
    assert "ArrowEvalPython" in plan[:join_pos] or plan.index("ArrowEvalPython") > 0


def test_corpus_gini_single_exchange(spark, sf_dir):
    """Gini's sort-rank identity must share ONE group exchange between
    the row_number window and the moment aggregation — never a second
    shuffle or any join."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_corpus_gini"))
    assert s["exchanges"] == 1 and s["windows"] == 1, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 0, s


def test_rolling_corr_two_exchanges_one_window(spark, sf_dir):
    """Daily aggregation + ONE window frame shared by all five sums:
    two exchanges, one window, one scan, no joins."""
    from simple_pos_kafka_pyspark_airflow_spark.analyze import plan_summary

    s = plan_summary(build(spark, sf_dir, "q_rolling_corr"))
    assert s["exchanges"] == 2 and s["windows"] == 1 and s["scans"] == 1, s
    assert s["broadcast_joins"] + s["sort_merge_joins"] == 0, s


def test_funnel_pushes_step_type_filters(spark, sf_dir):
    """Every funnel step scans a type-filtered slice: the event_type
    equality predicates must reach the parquet scans as pushed filters
    (no full-fact scan per step)."""
    plan = explain_str(build(spark, sf_dir, "q_funnel_steps"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln and "event_type" in ln]
    assert len(pushed) >= 3, plan


def test_audit_fk_anti_join_no_cartesian(spark, sf_dir):
    """The orphan scan is one anti-join per violation class — never a
    cartesian, and the parent side carries only its key column."""
    plan = explain_str(build(spark, sf_dir, "q_audit_fk"))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "customer" in ln]
    assert not reads or all("c_name" not in ln for ln in reads), plan


def test_join_size_sketch_joins_sketches_not_facts(spark, sf_dir):
    """The estimator's whole point: the per-depth inner product joins two
    ≤ depth·width-row SKETCH tables (broadcast), and the only fact-sized
    join in the plan is the certification-only exact arm."""
    plan = explain_str(build(spark, sf_dir, "q_join_size_sketch"))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_salted_join_exchanges_on_key_and_salt(spark, sf_dir):
    """The salted join's whole point is the SHUFFLE KEY: both exchanges
    must hash-partition on (okey, _salt) — never okey alone — so a hot
    key's rows spread across n_salts reducer tasks. The replicated dim
    must not be broadcast (a broadcast would make the salting pointless
    and hide the skew fix the operator exists to provide)."""
    import re

    from simple_pos_kafka_pyspark_airflow_spark.operators.joins import (
        salted_equi_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    # at test SF the dim is auto-broadcastable, which would hide the
    # shuffle shape the operator exists to produce at scale — disable the
    # threshold to see the at-scale plan (the operator itself does not
    # forbid a broadcast: if the dim fits, broadcast is simply better)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(salted_equi_join(li, o, "okey", n_salts=8))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    ex = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert ex and all("okey" in e and "_salt" in e for e in ex), (ex, plan)
    assert "BroadcastExchange" not in plan, plan


def test_salted_join_equals_plain_join_under_planted_hot_key(spark):
    """Planted skew: one key owns half the fact. Inner and left results
    must be row-identical to the plain join, including dim keys with no
    fact rows (left) and fact keys with no dim row (left null-extend)."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.joins import (
        salted_equi_join,
    )

    fact_rows = [(0, i) for i in range(500)] + [(i % 50 + 1, i) for i in range(500)]
    fact = spark.createDataFrame(fact_rows, "k long, payload long")
    # dim misses keys 40..50 so the left join null-extends some fact rows
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(40)], "k long, attr string")
    for how in ("inner", "left"):
        got = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in salted_equi_join(fact, dim, "k", n_salts=8, how=how).collect()
        )
        want = sorted(
            (r["k"], r["payload"], r["attr"])
            for r in fact.join(dim, "k", how).collect()
        )
        # inner: 500 hot-key rows + 390 matched tail rows; left: all 1000
        assert got == want and len(got) == (890 if how == "inner" else 1000), how


def test_salted_join_rejects_bad_args(spark):
    import pytest

    from simple_pos_kafka_pyspark_airflow_spark.operators.joins import (
        salted_equi_join,
    )

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="inner/left"):
        salted_equi_join(df, df, "k", how="right")
    with pytest.raises(ValueError, match="n_salts"):
        salted_equi_join(df, df, "k", n_salts=0)


def test_pq_topk_batch_bounded_shuffle_and_code_only_scan(spark, sf_dir):
    """q_embed_pq: BOTH windows (ADC candidate cut, exact-re-rank top-k)
    must ride the rank-limit pushdown — WindowGroupLimit Partial below
    each exchange — so neither the corpus×queries ADC set nor the
    candidate set shuffles unbounded; the query/candidate sides arrive
    by broadcast."""
    plan = explain_str(build(spark, sf_dir, "q_embed_pq"))
    assert plan.count("WindowGroupLimit") >= 4, plan  # 2 windows × partial+final
    assert "BroadcastExchange" in plan, plan


def _node_count(plan: str, node: str) -> int:
    """Count PHYSICAL NODE lines '(n) <node>' in formatted explain —
    the details section repeats every node name, so a raw substring
    count double-reports."""
    import re

    return len(re.findall(r"\(\d+\) " + node + r"\b", plan))


def test_ndcg_pushes_window_group_limit(spark, sf_dir):
    """Both NDCG rankings filter row_number() <= k immediately, so Spark
    must plan WindowGroupLimit (partial below the exchange, final above)
    for BOTH the run and the ideal window — per-query top-k never ships
    whole partitions. Two Window nodes, no more."""
    plan = explain_str(build(spark, sf_dir, "q_retrieval_ndcg"))
    assert _node_count(plan, "WindowGroupLimit") == 4, plan
    assert _node_count(plan, "Window") == 2, plan


def test_exact_moment_stats_are_single_exchange(spark, sf_dir):
    """grouped_linreg_exact and welch_ttest_exact are ONE
    partial-aggregable shuffle each: exactly one Exchange in the plan,
    with partial aggregation below it (map-side combine). A second
    exchange would mean the moments recompute or the finish re-shuffles."""
    for q in ("q_stats_linreg", "q_ab_ttest", "q_stats_linreg2"):
        plan = explain_str(build(spark, sf_dir, q))
        assert _node_count(plan, "Exchange") == 1, (q, plan)
        assert "partial_" in plan, (q, plan)


def test_gapfill_interp_single_window_node(spark, sf_dir):
    """All four neighbor columns (prev/next value and day) share one
    partitioning and ordering, so Catalyst must evaluate them in a
    SINGLE Window node (two frames, one sort) — a second Window node
    would mean a redundant per-key sort."""
    plan = explain_str(build(spark, sf_dir, "q_gapfill_interp"))
    assert _node_count(plan, "Window") == 1, plan


def test_nullsafe_join_is_hash_join(spark, sf_dir):
    """`<=>` must plan as a HASH join (Catalyst treats EqualNullSafe as
    an equi-key) — a nested-loop fallback would be a 100 TB outage for
    what is semantically an equi-join."""
    plan = explain_str(build(spark, sf_dir, "q_join_nullsafe"))
    assert _node_count(plan, "BroadcastHashJoin") + _node_count(plan, "SortMergeJoin") >= 1, plan
    assert _node_count(plan, "BroadcastNestedLoopJoin") == 0, plan


def test_eval_auc_equals_pairwise_reference(spark):
    """q_eval_auc's midrank algebra pinned to the DEFINITION of AUC:
    P(score_pos > score_neg) + 0.5·P(tie), computed by brute pairwise
    comparison on the sf0.001 units (15 users — O(n²) is fine here)."""
    from simple_pos_kafka_pyspark_airflow_spark.plans import load_registry

    sf = "/root/testdata/sf0.001"
    reg = load_registry()
    got = reg["q_eval_auc"].build(spark, sf).collect()[0]

    ev = spark.read.parquet(f"{sf}/events.parquet")
    unit = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "click",
                        F.floor(F.col("value") * 100).cast("long"),
                    )
                ),
                F.lit(0),
            ).alias("score"),
            F.when(
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14,
                1,
            )
            .otherwise(0)
            .alias("y"),
        )
        .collect()
    )
    pos = [r["score"] for r in unit if r["y"] == 1]
    neg = [r["score"] for r in unit if r["y"] == 0]
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert pos and neg, "degenerate split — pick a different threshold"
    # u2 = 2*U1 = sum over pairs of (2 if pos>neg, 1 if tie, 0)
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert got["u2"] == u2
    assert got["auc"] == u2 / (2 * len(pos) * len(neg))


def test_auc_exact_grouped_and_degenerate(spark):
    """auc_exact per group: pairwise-definition equality per group; a
    one-class group yields NULL auc (not an error) with its counts."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.aggregates import auc_exact

    rows = []
    # group A: informative scores with ties; group B: all positive
    a = [(10, 1), (9, 1), (9, 0), (5, 0), (5, 1), (2, 0), (2, 0), (1, 1)]
    for i, (s, y) in enumerate(a):
        rows.append(("A", i, s, y))
    for i, (s, y) in enumerate([(3, 1), (7, 1)]):
        rows.append(("B", 100 + i, s, y))
    df = spark.createDataFrame(rows, "g string, id int, s long, y int")
    got = {
        r["g"]: r
        for r in auc_exact(
            df, F.col("s"), F.col("y"), F.col("id"), group_cols=["g"]
        ).collect()
    }
    pos = [s for s, y in a if y == 1]
    neg = [s for s, y in a if y == 0]
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    assert got["A"]["n_pos"] == len(pos) and got["A"]["n_neg"] == len(neg)
    assert got["A"]["u2"] == u2
    assert got["A"]["auc"] == u2 / (2 * len(pos) * len(neg))
    assert got["B"]["n_pos"] == 2 and got["B"]["n_neg"] == 0
    assert got["B"]["auc"] is None


def test_last_touch_attribution_hand_sequence(spark):
    """Hand-built user journeys: conversions credit the latest preceding
    touch; a conversion before any touch lands in 'direct'; later touches
    don't steal earlier conversions; ties break by event id."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.timeseries import (
        last_touch_attribution,
    )

    rows = [
        # user 1: click -> purchase(10) -> view -> purchase(5)
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:01:00", 1, "purchase", 10.0),
        (3, "2024-01-01 00:02:00", 1, "view", 0.0),
        (4, "2024-01-01 00:03:00", 1, "purchase", 5.0),
        # user 2: purchase with NO preceding touch -> direct
        (5, "2024-01-01 00:00:00", 2, "purchase", 7.0),
        (6, "2024-01-01 00:01:00", 2, "signup", 0.0),
        # user 3: same-ts touch and purchase — id order decides (touch first)
        (7, "2024-01-01 00:00:00", 3, "click", 0.0),
        (8, "2024-01-01 00:00:00", 3, "purchase", 3.0),
        # error events are never touches
        (9, "2024-01-01 00:00:00", 4, "error", 0.0),
        (10, "2024-01-01 00:01:00", 4, "purchase", 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["touch"]: (r["n_conversions"], r["attributed_cents"])
        for r in last_touch_attribution(df).collect()
    }
    assert got == {
        "click": (2, 1300),   # user1 p1 (1000) + user3 p (300)
        "view": (1, 500),     # user1 p2
        "direct": (2, 900),   # user2 (700) + user4 (200, error not a touch)
    }


def test_first_touch_attribution(spark):
    from simple_pos_kafka_pyspark_airflow_spark.operators.timeseries import (
        last_touch_attribution,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "signup", 0.0),
        (2, "2024-01-01 00:01:00", 1, "click", 0.0),
        (3, "2024-01-01 00:02:00", 1, "purchase", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    last = {r["touch"]: r["attributed_cents"] for r in last_touch_attribution(df).collect()}
    first = {
        r["touch"]: r["attributed_cents"]
        for r in last_touch_attribution(df, model="first").collect()
    }
    assert last == {"click": 1000}
    assert first == {"signup": 1000}


def test_linear_touch_attribution_hand_sequence(spark):
    """Equal-split multi-touch on the exact micro-cent grid: credits are
    (cents*1e6*n_type) div n_all per conversion; no preceding touch ->
    full revenue in 'direct'; a type with zero preceding count never
    appears in that conversion's legs."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.timeseries import (
        linear_touch_attribution,
    )

    rows = [
        # user 1: click, view, click, then two purchases
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:01:00", 1, "view", 0.0),
        (3, "2024-01-01 00:02:00", 1, "click", 0.0),
        (4, "2024-01-01 00:03:00", 1, "purchase", 2.0),
        (5, "2024-01-01 00:04:00", 1, "purchase", 1.0),
        # user 2: unattributed purchase
        (6, "2024-01-01 00:00:30", 2, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["touch"]: (r["n_conversions"], r["attributed_microcents"])
        for r in linear_touch_attribution(df).collect()
    }
    # purchase 4: micro=2e8, c_click=2, c_view=1, n=3
    # purchase 5: micro=1e8, same counts (purchases are not touches)
    assert got == {
        "click": (2, 200_000_000 * 2 // 3 + 100_000_000 * 2 // 3),
        "view": (2, 200_000_000 // 3 + 100_000_000 // 3),
        "direct": (1, 100_000_000),
    }, got


def test_html_extraction_plan_shape(spark, sf_dir):
    """Markup front-door plan pins. q_text_extract_md stays a scan-fused
    projection (zero Exchange). q_text_extract_html runs the r15 ROW
    form: per-line scoring in whole-stage codegen (no interpreted
    higher-order transform/filter over the line array — the r15 2.9×
    win) at the cost of exactly ONE doc-keyed exchange with partial
    aggregation below it; no join anywhere."""
    plan = explain_str(build(spark, sf_dir, "q_text_extract_md"))
    assert "Exchange" not in plan, plan

    plan = explain_str(build(spark, sf_dir, "q_text_extract_html"))
    assert _node_count(plan, "Exchange") == 1, plan
    assert "Join" not in plan, plan
    # partial (map-side) aggregation below the exchange
    assert "partial_" in plan or "Partial" in plan, plan
    # the per-line regex scoring must not sit under interpreted HOFs:
    # transform()/filter() lambdas would show as LambdaFunction over the
    # scoring structs in the projection BELOW the aggregate. The only
    # remaining lambda use is the final kept-lines join inside the
    # aggregate expression itself.
    assert "CodegenFallback" not in plan, plan


def test_attribution_single_user_exchange(spark, sf_dir):
    """Every attribution model (last/first window-carry, linear's
    conditional-count windows) pays exactly ONE fact-sized hash exchange
    on the user key; the final tiny groupBy may add its own pair. No
    join, no sort beyond the per-user window sort."""
    for q in ("q_attribution_linear", "q_attribution_ushape"):
        plan = explain_str(build(spark, sf_dir, q))
        assert _node_count(plan, "Exchange") <= 2, (q, plan)
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, q
    # q_attribution unions the two models: two window branches over the
    # same fact, each one user exchange + the tiny agg exchange
    plan = explain_str(build(spark, sf_dir, "q_attribution"))
    assert _node_count(plan, "Exchange") <= 4, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


def test_position_touch_attribution_hand_sequence(spark):
    """U-shape conventions: 1 touch -> 100%, 2 -> 50/50, >=3 -> 40% ends
    + 20% split over middles (per-type middle share on the exact
    micro-cent grid); no touches -> direct."""
    from simple_pos_kafka_pyspark_airflow_spark.operators.timeseries import (
        position_touch_attribution,
    )

    rows = [
        # user 1: click, view, view, signup -> purchase $1.00
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:01:00", 1, "view", 0.0),
        (3, "2024-01-01 00:02:00", 1, "view", 0.0),
        (4, "2024-01-01 00:03:00", 1, "signup", 0.0),
        (5, "2024-01-01 00:04:00", 1, "purchase", 1.0),
        # user 2: two touches -> 50/50
        (6, "2024-01-01 00:00:00", 2, "view", 0.0),
        (7, "2024-01-01 00:01:00", 2, "click", 0.0),
        (8, "2024-01-01 00:02:00", 2, "purchase", 1.0),
        # user 3: single touch -> 100%
        (9, "2024-01-01 00:00:00", 3, "signup", 0.0),
        (10, "2024-01-01 00:01:00", 3, "purchase", 2.0),
        # user 4: unattributed
        (11, "2024-01-01 00:00:00", 4, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["touch"]: (r["n_conversions"], r["attributed_microcents"])
        for r in position_touch_attribution(df).collect()
    }
    m = 100_000_000  # $1.00 in microcents
    # user 1 (n=4): ends click/signup 40% each; middles: two views split 20%
    # user 2 (n=2): view (first) 50%, click (last) 50%
    # user 3 (n=1): signup 100% of $2.00
    assert got == {
        "click": (2, (m * 2) // 5 + m // 2),
        "view": (2, (m * 2) // (5 * 2) + m // 2),
        "signup": (2, (m * 2) // 5 + 2 * m),
        "direct": (1, m),
    }, got


def test_attribution_microcent_grid_violations_fail_loudly(spark):
    """The micro-cent grid's preconditions are ENFORCED, not just
    documented (r13, ADVICE): a negative conversion value (refund /
    chargeback row) raises USER_RAISED_EXCEPTION instead of silently
    producing engine-divergent 40/20/40 or equal splits; NULL values
    still pass through as NULL credit. Both division-based models.
    r14 (ADVICE): the negative-value failure names its likely cause —
    a refund row, normal in conversion data — and tells the caller to
    pre-filter, instead of a generic grid-arithmetic message."""
    import pytest as _pytest

    from simple_pos_kafka_pyspark_airflow_spark.operators.timeseries import (
        linear_touch_attribution,
        position_touch_attribution,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:01:00", 1, "view", 0.0),
        (3, "2024-01-01 00:02:00", 1, "purchase", -5.0),  # refund row
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    for model in (linear_touch_attribution, position_touch_attribution):
        with _pytest.raises(Exception, match="refund/chargeback"):
            model(df).collect()

    # NULL conversion value: row keeps its legs, credit NULL (sum skips)
    rows_null = [
        (1, "2024-01-01 00:00:00", 1, "click", 0.0),
        (2, "2024-01-01 00:02:00", 1, "purchase", None),
        (3, "2024-01-01 00:03:00", 1, "purchase", 3.0),
    ]
    df_null = spark.createDataFrame(
        rows_null,
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r["touch"]: (r["n_conversions"], r["attributed_microcents"])
        for r in linear_touch_attribution(df_null).collect()
    }
    assert got == {"click": (2, 300_000_000)}, got
