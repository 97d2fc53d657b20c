"""Physical-plan audits: the plans we designed are the plans Catalyst runs.

SURVEY.md §7.3 — pushdown/pruning/broadcast are free only if the query is
declared right; these tests pin that property so refactors can't silently
regress it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    """Formatted physical plan (includes full PushedFilters / ReadSchema)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def test_q01_filter_pushdown_and_codegen(spark):
    from datasmith_spark.queries import QUERIES

    df = QUERIES["q01_pricing_summary"](spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
    # whole-stage codegen spans are marked '*(n)'; AQE reveals the final
    # plan only after execution
    df.collect()
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1)" in simple and "isFinalPlan=true" in simple, simple
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_q04_broadcast_hash_join(spark):
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q04_broadcast_map_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q12_left_anti_broadcast(spark):
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q12_anti_join_resume"](spark, SF_DIR))
    assert "LeftAnti" in plan


def test_pipeline_chain_is_shuffle_free(spark, clips_path):
    """The whole filter chain must plan as ONE narrow chain: no Exchange
    between scan and labels (the property that holds at 10^12 rows)."""
    from datasmith_spark.pipeline import label_clips, label_clips_fused

    plan = _plan(label_clips(spark.read.parquet(clips_path), n_parts=16))
    assert "Exchange" not in plan, plan
    plan_fused = _plan(label_clips_fused(spark, clips_path, n_parts=16))
    # fused path: one repartition of the tiny path manifest is the only
    # exchange; no exchange of clip rows (formatted mode prints each node
    # twice: once in the tree, once in the details)
    assert plan_fused.count("+- Exchange") <= 1, plan_fused


def test_metrics_rollup_is_two_phase(spark, clips_path):
    """Salted metrics agg: partial on (lang, codec, salt), final on
    (lang, codec) — two HashAggregate pairs, no single-stage hot-key agg."""
    from datasmith_spark.pipeline import label_clips

    lab = label_clips(spark.read.parquet(clips_path), n_parts=16)
    salt = F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(16))
    partial = lab.groupBy("lang", "codec", salt.alias("_salt")).agg(F.count("*").alias("n"))
    final = partial.groupBy("lang", "codec").agg(F.sum("n").alias("n"))
    plan = _plan(final)
    assert plan.count("HashAggregate") >= 4  # partial+final for both phases


def test_pair_joins_have_no_nested_loops(spark):
    """Every pair-generating dedup/ANN query must plan as equi-joins on
    band/cell keys — no CartesianProduct / BroadcastNestedLoopJoin anywhere
    (the O(N^2) shapes that cannot survive 100x scale)."""
    from datasmith_spark.queries import QUERIES

    for q in (
        "q21_minhash_lsh",
        "q25_embedding_dup_pairs",
        "q26_simhash_candidates",
        "q31_winnow_fingerprint_pairs",
        "q34_capped_hotkey_pairs",
        "q35_ivf_ann_search",
        "q138_grid_neighbor_join",
    ):
        plan = _plan(QUERIES[q](spark, SF_DIR))
        assert "CartesianProduct" not in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_shingles_have_no_interpreted_lambda(spark):
    """Shingling must stay fully native (arrays_zip of slices): transform/
    LambdaFunction nodes in the plan would mean the interpreted HOF path —
    measured ~18x slower — crept back in."""
    from datasmith_spark.operators.dedup import shingles
    from datasmith_spark.queries import _corpus

    plan = _plan(shingles(_corpus(spark, SF_DIR), distinct=False))
    assert "lambdafunction" not in plan.lower(), plan


def test_audio_fp_pairs_plan_is_capped_equi_join(spark):
    """q38's pair stage (audited on the operator, since the query itself
    returns a localCheckpointed result) must be equi-joins on the key —
    no nested-loop shapes — and must contain the hot-key stats aggregate."""
    from datasmith_spark.operators.audio_fp import audio_neardup_pairs

    keys = spark.createDataFrame(
        [("a", "k1"), ("b", "k1"), ("c", "k2")], "clip_id string, fp_key string"
    )
    plan = _plan(audio_neardup_pairs(keys))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashAggregate" in plan  # key-frequency stats + size/inter counts


def test_audio_fp_hamming_plan_is_capped_equi_join(spark):
    """q40's ball lane: the 33x expansion must be a native explode (no
    Python UDF node) and the ball-to-exact match must be equi-joins — no
    nested-loop shapes. The only allowed cross-ish node would be the
    33-element literal array explode, which is a Generate, not a join."""
    from datasmith_spark.operators.audio_fp import audio_neardup_pairs_hamming

    from datasmith_spark.operators.audio_fp import hamming_ball_keys

    ikeys = spark.createDataFrame(
        [("a", 5), ("b", 5), ("c", 1 << 20)], "clip_id string, fp_ikey long"
    )
    # expansion plan (audited pre-checkpoint: the pair op localCheckpoints
    # the ball, which truncates lineage in the downstream plan)
    ball_plan = _plan(
        hamming_ball_keys(ikeys.select(F.col("clip_id").alias("id"), F.col("fp_ikey").alias("k")))
    )
    assert "Generate" in ball_plan and "explode" in ball_plan, ball_plan
    assert "BatchEvalPython" not in ball_plan and "ArrowEvalPython" not in ball_plan
    plan = _plan(audio_neardup_pairs_hamming(ikeys))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q58_rollup_is_one_expand_one_scan(spark):
    """ROLLUP must run as ONE scan + Expand + hash aggregate — not one
    groupBy per level unioned (which would triple the scan volume)."""
    from datasmith_spark.queries import QUERIES

    df = QUERIES["q58_rollup_manifest"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Expand") >= 1, plan
    # formatted mode prints each node once in the tree and once in the
    # details section — one real scan node == exactly 2 mentions
    assert plan.count("Scan parquet") == 2, plan
    assert "Union" not in plan, plan
    # partial (map-side) aggregation before the single exchange
    assert plan.count("HashAggregate") >= 2 and plan.count("Exchange") == 2, plan


def test_span_and_cluster_queries_have_no_nested_loops(spark):
    """The round's new span/cluster/composition queries must also plan as
    pure equi-joins: the shared-span test is groupBy + semi-join (never
    doc-to-doc), CC iterations are id-keyed joins, and the composed q62
    inherits both."""
    from datasmith_spark.queries import QUERIES

    for q in (
        "q52_dedup_clusters",
        "q53_leakage_safe_split",
        "q60_dup_spans",
        "q61_cut_dup_spans",
        "q62_text_curation_report",
    ):
        plan = _plan(QUERIES[q](spark, SF_DIR))
        assert "CartesianProduct" not in plan, (q, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (q, plan)


def test_image_neardup_plan_is_capped_equi_join(spark):
    """q65's pair stage: banded candidates through the hot-key cap, Hamming
    verify as JVM-native xor+bit_count joins — no nested-loop shapes, no
    Python in the verify (BatchEvalPython only in the hash map itself)."""
    from datasmith_spark.operators.image_fp import image_neardup_pairs

    hashes = spark.createDataFrame(
        [("a", 1, 2, 3, 4), ("b", 1, 9, 9, 9), ("c", 7, 7, 7, 7)],
        "img_id string, b0 int, b1 int, b2 int, b3 int",
    )
    plan = _plan(image_neardup_pairs(hashes))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashAggregate" in plan  # key-frequency stats
    assert "BatchEvalPython" not in plan  # verify is whole-stage codegen


def test_overlap_mix_plan_is_equi_join(spark):
    """q89's pair stage must be a hash-partitioned equi-join on the pair
    key — no nested-loop shapes — with the mix kernel as a single
    ArrowEvalPython/mapInPandas node over the joined rows."""
    from datasmith_spark.operators.audio_ops import mix_overlay_clips

    ddl = (
        "clip_id string, bytes binary, sr_hz int, dur_ms int, "
        "codec string, transcript string, pair_id int"
    )
    base = spark.createDataFrame([], ddl)
    ovl = spark.createDataFrame([], ddl)
    plan = _plan(mix_overlay_clips(base, ovl, on="pair_id", digest=True))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_editdist_verify_plan_is_pure_codegen(spark):
    """q90's verify stage must be zero-Python (F.levenshtein is a JVM
    built-in) and its joins equi-joins — no nested-loop shapes."""
    from datasmith_spark.operators.dedup import editdist_verify

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    cand = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    plan = _plan(editdist_verify(docs, cand))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_xcorr_align_plan_is_equi_join(spark):
    """q156's general pair form must be a hash-partitioned equi-join on
    the pair key — no nested-loop shapes — with the xcorr kernel as a
    single mapInPandas node over the joined rows (mix_overlay_clips'
    shape exactly)."""
    from datasmith_spark.operators.audio_ops import xcorr_align_clips

    ddl = "pair_id int, clip_id string, bytes binary, sr_hz int, codec string"
    base = spark.createDataFrame([], ddl)
    probe = spark.createDataFrame([], ddl)
    plan = _plan(xcorr_align_clips(base, probe))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tcloseness_grid_broadcasts_small_sides(spark):
    """q179: the sensitive-alphabet grid and the scalar total reach the
    per-class frame as broadcasts — no shuffle keyed on row-scale data
    beyond the initial groupBys."""
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q179_t_closeness_audit"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_audit_plans_are_cell_equi_joins(spark):
    """q180/q181: every corpus-scale join keys on the IVF cell (equi-join);
    the only nested-loop is q180's bounded broadcast ground-truth panel."""
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q181_knn_hubness"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    plan80 = _plan(QUERIES["q180_ann_recall_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan80
    # exact ground truth side is allowed ONE broadcast nested loop NODE
    # (the bounded query panel vs corpus); the IVF side must still
    # equi-join. Formatted plans print each node twice (tree + detail),
    # so count the numbered detail headers.
    import re

    nl_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan80)
    assert len(nl_nodes) <= 1, plan80


def test_pagerank_iterations_are_equi_joins(spark):
    """q185: the per-order pair build and all three rank iterations are
    equi-joins + partial-aggregated groupBys — nothing cartesian."""
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q185_pagerank_copurchase"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_epoch_shuffle_window_is_bucket_partitioned(spark):
    """q187: the position window must partition by (epoch, bucket) — a
    global-order window (empty partition spec) would funnel the corpus
    through one task at scale."""
    from datasmith_spark.queries import QUERIES

    plan = _plan(QUERIES["q187_epoch_shuffle"](spark, SF_DIR))
    assert "Window" in plan
    import re

    # hashpartitioning on both epoch and bucket feeds the window
    assert re.search(r"hashpartitioning\([^)]*epoch[^)]*bucket", plan), plan


def test_entity_rank_queries_use_partitioned_windows(spark):
    """q48/q112/q145 (the round-5 verdict's 'global window at entity
    grain' items) must rank via the two-phase shape: any window ordering
    on the entity metric must be partitioned by the range-partition id
    (_pid); the only global windows allowed are over the bounded _pid
    count table (the broadcast prefix-offset side)."""
    import re

    from datasmith_spark.queries import QUERIES

    metric_cols = {
        "q48_curriculum_buckets": ("n_chars",),
        "q112_rfm_segments": ("r_days", "f_n", "m_cents"),
        "q145_top_decile_share": ("cents",),
    }
    for name, metrics in metric_cols.items():
        plan = _plan(QUERIES[name](spark, SF_DIR))
        assert "ntile(" not in plan, (name, plan)
        assert "_pid" in plan, (name, plan)
        for spec in re.findall(r"windowspecdefinition\([^)]*", plan):
            if any(m + "#" in spec for m in metrics):
                assert "_pid" in spec, (name, spec)
