"""Plan-regression tests: the physical plans the scale rules demand.

These fail when a refactor silently drops a pushdown, un-broadcasts a
dimension join, or inflates the shuffle count — the 100 TB failure
modes that correctness tests can't see.
"""

import pytest

from meteaudata_spark.ext import relational, textstats
from meteaudata_spark.ext import timeseries_queries as tsq
from meteaudata_spark.plans import inspect

SF = "/root/testdata/sf0.001"


def test_q1_pushdown_and_pruning(spark):
    df = relational.q1_pricing_summary(spark, SF)
    pushed = inspect.pushed_filters(df)
    assert any("l_shipdate" in f for f in pushed), pushed
    # projection pruned: scan must NOT read l_orderkey/l_partkey etc.
    cols = inspect.scan_columns(df)
    assert "l_orderkey" not in cols
    assert "l_comment" not in cols
    assert {"l_quantity", "l_extendedprice", "l_returnflag"} <= cols


def test_q5_broadcasts_all_dims(spark):
    df = relational.q5_supplier_volume(spark, SF)
    joins = inspect.join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 4, joins
    assert "CartesianProduct" not in joins


def test_q3_no_cartesian(spark):
    joins = inspect.join_strategies(relational.q3_shipping_priority(spark, SF))
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_resample_shuffle_budget(spark):
    # one agg shuffle + one spine-join shuffle pair + final sort: the
    # kernel must not regress into extra exchanges
    df = tsq.ts_resample_5min(spark, SF)
    assert inspect.exchange_count(df) <= 4, inspect.formatted_plan(df)


def test_doc_queries_prune_text_table(spark):
    # token stats must not read doc text twice / drag unused cols
    df = textstats.doc_text_stats(spark, SF)
    cols = inspect.scan_columns(df)
    assert "source" not in cols
    assert "lang" not in cols


def test_events_filter_pushdown(spark):
    from pyspark.sql import functions as F

    from meteaudata_spark.sources.tables import load_table

    ev = load_table(spark, SF, "events").filter(
        F.col("event_type") == "click"
    ).select("event_id")
    pushed = inspect.pushed_filters(ev)
    assert any("event_type" in f for f in pushed), pushed


def test_lsh_bucketize_is_shuffle_free(spark):
    """The LSH bucket stage must stay a narrow map — no KEYED exchange
    before the per-bucket grouping (the scale-adaptive round-robin
    spread at single-split test SFs is not part of the algorithm)."""
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_lsh_buckets(spark, SF)
    assert inspect.keyed_exchange_count(df) == 0, inspect.formatted_plan(df)


def test_ngram_jaccard_joins_on_long_keys(spark):
    """The shingle self-join must run on hashed BIGINT keys, not raw
    shingle strings (string shuffles dominate at scale)."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_ngram_jaccard_pairs(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "xxhash64" in plan, plan[:2000]


def test_quartiles_no_global_ntile(spark):
    # customer_revenue_quartiles must use the distributed range-rank,
    # never an unpartitioned ntile window (single-task sort at scale)
    df = relational.customer_revenue_quartiles(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "ntile(" not in plan, plan


def test_lsh_near_pairs_fully_distributed(spark):
    # scoring must be a distributed join + JVM fold: no Pandas stage
    # (the old driver-collected corpus broadcast) anywhere in the plan
    from meteaudata_spark.ext import simsearch

    plan = inspect.formatted_plan(simsearch.emb_lsh_near_pairs(spark, SF))
    assert "FlatMapGroupsInPandas" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_q4_semi_join_broadcasts(spark):
    df = relational.q4_late_orders(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    pushed = inspect.pushed_filters(df)
    assert any("o_orderdate" in f for f in pushed), pushed


def test_q14_single_aggregation(spark):
    """Promo share must come out of ONE aggregation over the fact
    scan: one partial+final agg pair, dim broadcast, no second scan."""
    df = relational.q14_promo_revenue_share(spark, SF)
    joins = inspect.join_strategies(df)
    assert "BroadcastHashJoin" in joins
    assert inspect.exchange_count(df) <= 1, inspect.formatted_plan(df)


# ----------------------------------------------------------------------
# round-2 additions
# ----------------------------------------------------------------------
def test_hash_split_is_map_only(spark):
    """Split membership is a row-local projection: zero exchanges."""
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_hash_split(spark, SF)
    assert inspect.keyed_exchange_count(df) == 0


def test_contamination_broadcasts_benchmark(spark):
    """The benchmark gram set must be the broadcast side — no
    sort-merge join of the corpus against it."""
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_contamination(spark, SF)
    joins = inspect.join_strategies(df)
    assert any("BroadcastHashJoin" in j for j in joins), joins
    assert not any("SortMergeJoin" in j for j in joins), joins


def test_multires_rollup_scans_fact_once(spark):
    """Coarser levels aggregate the cached hourly partial, not the
    fact table: exactly one events scan in the plan."""
    plan = inspect.formatted_plan(tsq.ts_multires_rollup(spark, SF))
    assert plan.count("events.parquet") <= 1, plan[:2000]


def test_top_customers_preaggregates_before_join(spark):
    """The per-orderkey partial aggregate must sit BELOW the
    orders join (aggregate-pushdown-by-hand)."""
    df = relational.top_customers_by_revenue(spark, SF)
    plan = inspect.formatted_plan(df)
    # a per-orderkey aggregate exists at all (the pushdown-by-hand)
    assert "Keys [1]: [l_orderkey" in plan, plan[:2000]
    # and the whole query needs only the two aggregation exchanges —
    # the orderkey partial + the customer final (joins broadcast)
    assert inspect.exchange_count(df) <= 2, plan[:2000]


def test_q7_broadcasts_all_dims(spark):
    df = relational.q7_nation_volume(spark, SF)
    joins = inspect.join_strategies(df)
    bhj = [j for j in joins if "Broadcast" in j]
    assert len(bhj) >= 4, joins  # supplier, nation×2, customer


def test_kmeans_assignment_is_map_only(spark):
    """Both assignment passes ride the Arrow-matmul map (centroids in
    the task closure) — no join against the corpus at all; the only
    shuffles are the k-row update/output aggregations."""
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_kmeans_refine(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    fold = simsearch.kmeans_refine(
        spark.read.parquet(f"{SF}/embeddings.parquet"), exact_fold=True
    )
    fold_plan = inspect.formatted_plan(fold)
    # the oracle-harness fold path keeps the broadcast cross-join shape
    assert "BroadcastNestedLoopJoin" in fold_plan or "BroadcastExchange" in fold_plan


def test_kmeans_fast_refine_equals_fold_refine(spark):
    from meteaudata_spark.ext import simsearch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    fast = sorted(map(tuple, simsearch.kmeans_refine(emb).collect()))
    fold = sorted(
        map(tuple, simsearch.kmeans_refine(emb, exact_fold=True).collect())
    )
    assert fast == fold


# ----------------------------------------------------------------------
# round-6 continuation operators
# ----------------------------------------------------------------------
def test_segment_dedup_shuffle_budget(spark):
    from meteaudata_spark.ext import dedup

    # exactly the design: one window shuffle on the segment + one
    # per-doc agg shuffle — a regression to joins would inflate this
    df = dedup.doc_segment_dedup(spark, SF)
    assert inspect.keyed_exchange_count(df) <= 2, inspect.formatted_plan(df)


def test_pq_assign_is_map_only_after_broadcast(spark):
    from meteaudata_spark.ext import simsearch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = simsearch.pq_assign(emb)
    # the corpus side must NOT shuffle: only the tiny codebook agg
    # exchanges (plus its broadcast); the assignment itself is a
    # projection
    assert inspect.exchange_count(df) <= 2, inspect.formatted_plan(df)
    joins = inspect.join_strategies(df)
    assert "SortMergeJoin" not in joins, joins


def test_bloom_contamination_broadcasts_filter(spark):
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_contamination_bloom(spark, SF)
    joins = inspect.join_strategies(df)
    # the bit table rides a broadcast join; the corpus must never be
    # the build side of a shuffle join
    assert "BroadcastHashJoin" in joins, joins
    assert "SortMergeJoin" not in joins, joins


def test_m4_broadcasts_bounds(spark):
    df = tsq.ts_m4_downsample(spark, SF)
    joins = inspect.join_strategies(df)
    # bounds join only (the logical plan may print the reused
    # broadcast once per reference) — never a shuffle join
    assert set(joins) == {"BroadcastHashJoin"}, joins


def test_seasonal_decompose_broadcasts_profile(spark):
    df = tsq.ts_seasonal_decompose(spark, SF)
    joins = inspect.join_strategies(df)
    assert "BroadcastHashJoin" in joins, joins
    assert "SortMergeJoin" not in joins, joins


def test_gopher_rules_is_map_only(spark):
    # the rule battery is one narrow projection: no exchanges at all
    df = textstats.doc_gopher_rules(spark, SF)
    assert inspect.keyed_exchange_count(df) == 0, inspect.formatted_plan(df)
    cols = inspect.scan_columns(df)
    assert "source" not in cols and "lang" not in cols


def test_chunk_text_is_map_only(spark):
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_chunk_text(spark, SF)
    assert inspect.keyed_exchange_count(df) == 0, inspect.formatted_plan(df)
    # only doc_id + text may be read
    assert inspect.scan_columns(df) <= {"doc_id", "text"}


def test_semdedup_shuffles_on_cluster_only(spark):
    from meteaudata_spark.ext import simsearch

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = simsearch.semdedup(emb)
    joins = inspect.join_strategies(df)
    # within-cluster self-join + final pair agg; nothing quadratic
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins
    # assignment is the Arrow map stage: the corpus must not shuffle
    # before the centroid_id join keys exist
    assert inspect.exchange_count(df) <= 4, inspect.formatted_plan(df)


def test_autocorr_no_global_window(spark):
    df = tsq.ts_autocorr(spark, SF)
    plan = inspect.formatted_plan(df)
    # every window/sort is keyed; a single-partition exchange would be
    # the 100 TB regression
    assert "SinglePartition" not in plan, plan
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins


def test_bm25_no_global_sort_for_topk(spark):
    df = textstats.doc_bm25_search(spark, SF)
    plan = inspect.formatted_plan(df)
    # top-k must be TakeOrderedAndProject (per-partition heaps), and
    # the only single-partition stage is the k-row rank window
    assert "TakeOrderedAndProject" in plan, plan
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins


def test_pagerank_iterations_stay_keyed(spark):
    from meteaudata_spark.ext.graph import doc_domain_pagerank

    df = doc_domain_pagerank(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins
    plan = inspect.formatted_plan(df)
    # every shuffle is keyed on node/src/dst; no global single-partition
    # stage anywhere in the iteration chain
    assert "SinglePartition" not in plan, plan


def test_range_join_is_equi_join_not_nested_loop(spark):
    from meteaudata_spark.ext.rangejoin import ts_range_join

    df = ts_range_join(spark, SF)
    joins = inspect.join_strategies(df)
    # the whole point: the BETWEEN predicate must NOT plan as a
    # nested-loop/cartesian — the bucket equi-join carries it
    assert "BroadcastNestedLoopJoin" not in joins, joins
    assert "CartesianProduct" not in joins, joins


def test_q2_broadcasts_dims_and_stays_equi(spark):
    from meteaudata_spark.ext import relational as R

    df = R.q2_min_cost_supplier(spark, SF)
    joins = inspect.join_strategies(df)
    # part + supplier(+nation+region) broadcast onto the fact scan;
    # the decorrelated min join may be either strategy but never a
    # nested loop / cartesian
    assert joins.count("BroadcastHashJoin") >= 2, joins
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_q11_scalar_subquery_is_broadcast(spark):
    from meteaudata_spark.ext import relational as R

    df = R.q11_important_parts(spark, SF)
    joins = inspect.join_strategies(df)
    # the 1-row totals ride a broadcast, never a shuffled join
    assert "BroadcastNestedLoopJoin" in joins or joins.count("BroadcastHashJoin") >= 1, joins
    assert "CartesianProduct" not in joins


def test_q16_anti_join_is_broadcast(spark):
    from meteaudata_spark.ext import relational as R

    plan = inspect.formatted_plan(R.q16_supplier_part_counts(spark, SF))
    assert "LeftAnti, BuildRight" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    ), plan[:1200]


def test_q20_semi_join_is_broadcast(spark):
    from meteaudata_spark.ext import relational as R

    plan = inspect.formatted_plan(R.q20_potential_promotions(spark, SF))
    assert "LeftSemi" in plan, plan[:1200]
    assert "CartesianProduct" not in plan


def test_substring_spans_shuffles_stay_keyed(spark):
    from meteaudata_spark.ext import dedup as dd

    df = dd.doc_substring_spans(spark, SF)
    plan = inspect.formatted_plan(df)
    # no pair fan-out anywhere: gram window + doc windows + rollup
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the scan only needs doc_id + text
    cols = inspect.scan_columns(df)
    assert "source" not in cols and "lang" not in cols


def test_dsir_weights_broadcast_llr(spark):
    df = textstats.doc_dsir_weights(spark, SF)
    joins = inspect.join_strategies(df)
    # the 256-row llr relation and the 1-row totals must both ride
    # broadcast; the only real shuffles are the bucket agg and the
    # per-doc sum
    assert joins.count("BroadcastHashJoin") >= 1, joins
    assert "SortMergeJoin" not in joins, joins
    assert "CartesianProduct" not in joins
    cols = inspect.scan_columns(df)
    assert "source" not in cols and "n_chars" not in cols


def test_lineitem_profile_single_scan(spark):
    from meteaudata_spark.ext import profile as prof

    df = prof.lineitem_profile(spark, SF)
    plan = inspect.formatted_plan(df)
    # NO multi-distinct Expand (the n_cols× row-multiplication through
    # one shuffle): every per-column stat (distinct count AND the base
    # null/min/max stats, folded in r14) runs as one pruned per-column
    # branch → exactly 11 scan nodes, no full-width base pass
    import re

    assert "Expand" not in plan, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 11, plan
    assert "CartesianProduct" not in inspect.join_strategies(df)


def test_rolling_corr_no_global_window(spark):
    df = tsq.ts_rolling_corr(spark, SF)
    plan = inspect.formatted_plan(df)
    # the rolling window is an offset explode + keyed agg — there must
    # be no single-partition window over the bucket series (the final
    # orderBy is a range-partitioned sort, not SinglePartition)
    assert "Window" not in plan, plan
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_matryoshka_corpus_side_not_shuffled(spark):
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_matryoshka_recall(spark, SF)
    joins = inspect.join_strategies(df)
    # queries broadcast against the corpus scan on both rankers
    assert joins.count("BroadcastHashJoin") >= 1 or joins.count(
        "BroadcastNestedLoopJoin"
    ) >= 1, joins
    assert "CartesianProduct" not in joins


def test_latest_state_is_one_keyed_agg(spark):
    df = tsq.ts_latest_state(spark, SF)
    plan = inspect.formatted_plan(df)
    # struct-max compaction: no window, no row_number — one partial +
    # one final hash aggregate around a single keyed exchange
    assert "Window" not in plan, plan
    assert inspect.exchange_count(df) <= 2, plan


def test_ndcg_ideal_is_take_ordered(spark):
    df = textstats.doc_bm25_ndcg(spark, SF)
    plan = inspect.formatted_plan(df)
    # both the retrieved and ideal top-20 must be per-partition heaps
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in inspect.join_strategies(df)


def test_bm25_multi_broadcasts_terms_and_keyed_rank(spark):
    df = textstats.doc_bm25_multi(spark, SF)
    plan = inspect.formatted_plan(df)
    joins = inspect.join_strategies(df)
    assert "SortMergeJoin" not in joins, joins
    assert "CartesianProduct" not in joins
    # the rank window is PARTITIONED by query_id (keyed exchange); the
    # only SinglePartition stage is the 1-row n_avg scalar broadcast
    assert "hashpartitioning(query_id" in plan, plan
    assert plan.count("SinglePartition") <= 1, plan


def test_group_sample_window_is_keyed(spark):
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_group_sample(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "SinglePartition" not in plan, plan


def test_event_trigrams_topk_distributed(spark):
    df = tsq.ts_event_trigrams(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    # lead windows are keyed on user_id
    assert "hashpartitioning(user_id" in plan, plan


def test_pipeline_funnel_single_scan(spark):
    import re

    df = textstats.doc_pipeline_funnel(spark, SF)
    plan = inspect.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_drift_report_no_cartesian(spark):
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_drift_report(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins


def test_phash_pipeline_is_narrow_then_keyed(spark):
    """mm_image_phash: digest-asset build + decode + DCT hash all ride
    Arrow maps (no shuffle beyond the asset build's id join); the
    near-dup miner over phash blocks joins on (block_idx, blk) keys —
    never a cartesian."""
    from meteaudata_spark.ext import multimodal

    df = multimodal.mm_image_phash(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins
    pairs = multimodal.image_neardup_pairs(
        multimodal.image_phash_blocks(
            multimodal._digest_assets(spark, SF)
        ),
        max_hamming=3,
    )
    joins = inspect.join_strategies(pairs)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_forecast_eval_hw_stays_keyed(spark):
    """ts_forecast_eval_hw: both recurrences are event_type-keyed
    applyInPandas; the join of the two forecast tables is a keyed
    equi-join and nothing collapses to a single partition except the
    final 5-row aggregate."""
    df = tsq.ts_forecast_eval_hw(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_keep_best_composes_cached_upstreams(spark):
    """doc_dedup_keep_best with precomputed inputs adds exactly one
    keyed join + one aggregate over them — no rescan of documents."""
    from meteaudata_spark.ext import dedup, textstats as ts

    clusters = dedup.doc_dedup_clusters(spark, SF)
    quality = ts.doc_quality_score(spark, SF)
    df = dedup.doc_dedup_keep_best(
        spark, SF, clusters=clusters, quality=quality
    )
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins


def test_consensus_keyed_joins_only(spark):
    """doc_dedup_consensus: two FULL OUTER equi-joins on (doc_a,
    doc_b) over the memoized pair relations — never a cartesian."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_dedup_consensus(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_calibration_keyed_joins_only(spark):
    """doc_minhash_calibration: pair list joined to the signature
    relation twice by doc id; agreement count is a JVM expression
    (no Pandas stage)."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_minhash_calibration(spark, SF)
    plan = inspect.formatted_plan(df)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" not in plan


def test_audio_vad_narrow_then_keyed(spark):
    """mm_audio_vad: digest synthesis + framing are narrow Arrow
    maps; the segment merge is a per-asset keyed window — no join at
    all in the plan."""
    from meteaudata_spark.ext import multimodal

    df = multimodal.mm_audio_vad(spark, SF)
    joins = inspect.join_strategies(df)
    assert joins == [] or (
        "CartesianProduct" not in joins
        and "BroadcastNestedLoopJoin" not in joins
    )


def test_url_dedup_single_keyed_agg(spark):
    """doc_url_dedup: decorate + normalize are one narrow projection;
    the whole query is ONE keyed hash-agg — no joins, no Python
    stages, exactly one shuffle exchange."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_url_dedup(spark, SF)
    assert inspect.join_strategies(df) == []
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert inspect.keyed_exchange_count(df) == 1, inspect.keyed_exchange_count(df)


def test_lexicon_filter_no_shuffle(spark):
    """doc_lexicon_filter: a pure narrow projection — zero exchanges,
    zero joins, the lexicon folded into whole-stage codegen (no
    broadcast relation, no Python)."""
    from meteaudata_spark.ext import textstats

    df = textstats.doc_lexicon_filter(spark, SF)
    assert inspect.join_strategies(df) == []
    assert inspect.keyed_exchange_count(df) == 0
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan
    assert "BroadcastExchange" not in plan


def test_perplexity_buckets_windows_stay_on_histogram(spark):
    """doc_perplexity_buckets: the doc-level work is keyed joins and
    a keyed hash-agg; every window partitions by lang OVER THE
    HISTOGRAM relation (post-agg), and nothing is cartesian or
    Python-side."""
    from meteaudata_spark.ext import textstats

    df = textstats.doc_perplexity_buckets(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan
    # no unpartitioned (global) window: every Window node must carry a
    # lang partition spec
    import re

    for m in re.finditer(r"Window \[", plan):
        seg = plan[m.start() : m.start() + 400]
        assert "lang" in seg, seg


def test_bq_topk_prunes_before_ranking(spark):
    """emb_bq_topk: the query side is a bounded broadcast (n_queries
    rows — the same intentional NLJ shape as emb_cosine_topk); the
    Hamming radius FILTER sits between the join and the first window,
    so ~80% of candidates never reach the shortlist ranking; exactly
    two windows (shortlist, rerank); no Python stages."""
    import re

    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_bq_topk(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan
    # Catalyst folds the radius fence INTO the join condition, so
    # candidates die during the broadcast join itself — assert the
    # bit_count fence sits on the join, before any window
    m = re.search(r"Join condition: .*bit_count.*<= 28", plan)
    assert m, "radius prune not in the join condition"
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert exec_plan.count("Window [") == 2, exec_plan.count("Window [")


def test_cascade_joins_keyed_except_scalar_counts(spark):
    """doc_dedup_cascade: survivor joins are keyed (doc_id /
    cluster_id); the only nested-loop joins are the three 1-row
    stage-count crossJoins (scalar broadcasts); no Python stage."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_dedup_cascade(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    # 3 scalar count crossJoins (each listed twice under AQE); the
    # single-copy guard: a unionAll regression would push this past 20
    assert joins.count("BroadcastNestedLoopJoin") <= 6, joins
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan


def test_audio_features_narrow_maps_only(spark):
    """mm_audio_features: digest synthesis + feature extraction are
    narrow Arrow maps over the docs scan — no join, no aggregation
    exchange; the only exchange is the final presentation sort."""
    from meteaudata_spark.ext import multimodal

    df = multimodal.mm_audio_features(spark, SF)
    assert inspect.join_strategies(df) == []
    assert inspect.keyed_exchange_count(df) <= 1, inspect.formatted_plan(df)


def test_gap_distribution_keyed_window_and_agg(spark):
    """ts_gap_distribution: one keyed lag window + one keyed hash-agg;
    no joins anywhere."""
    df = tsq.ts_gap_distribution(spark, SF)
    assert inspect.join_strategies(df) == []
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan


def test_lang_confusion_windows_on_matrix(spark):
    """doc_lang_confusion: the share window partitions by lang and
    runs over the post-agg matrix relation; no cartesian, no Python."""
    import re

    from meteaudata_spark.ext import textstats

    df = textstats.doc_lang_confusion(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    plan = inspect.formatted_plan(df)
    assert "ArrowEvalPython" not in plan
    for m in re.finditer(r"Window \[", plan):
        assert "lang" in plan[m.start() : m.start() + 400]


def test_similarity_histogram_reuses_memoized_pairs(spark):
    """emb_similarity_histogram after emb_lsh_near_pairs: no new memo
    entry — the scored-pair relation is shared, the histogram is one
    hash-agg on top."""
    from meteaudata_spark.ext import simsearch
    from meteaudata_spark.plans import opcache

    simsearch.emb_lsh_near_pairs(spark, SF).count()
    n_memo = len(opcache._memo)
    simsearch.emb_similarity_histogram(spark, SF).count()
    assert len(opcache._memo) == n_memo


def test_seasonal_strength_no_extra_fact_scan(spark):
    """ts_seasonal_strength: composes the decompose (one events scan)
    + one keyed hash-agg; no new scan, no cartesian, no Python."""
    df = tsq.ts_seasonal_strength(spark, SF)
    plan = inspect.formatted_plan(df)
    assert plan.count("events.parquet") <= 1, plan[:2000]
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "ArrowEvalPython" not in plan


def test_packing_efficiency_aggs_over_pack_relation(spark):
    """doc_packing_efficiency: two keyed aggs + one keyed join over
    the per-lang aggregate relation; no cartesian."""
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_packing_efficiency(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    assert "BroadcastNestedLoopJoin" not in joins


def test_downtime_report_keyed_window_and_agg(spark):
    """ts_downtime_report: one keyed lag window + one keyed agg; no
    joins."""
    df = tsq.ts_downtime_report(spark, SF)
    assert inspect.join_strategies(df) == []
    assert "ArrowEvalPython" not in inspect.formatted_plan(df)


def test_rfm_windows_stay_on_histograms(spark):
    """orders_rfm_segments: the only unpartitioned windows run over
    per-value histogram relations (post-agg, value-range-bounded);
    every nested-loop join is the 1-row date-anchor scalar broadcast
    (the customer relation feeds 7 plan references, so the anchor
    subtree prints once per reference); the customer relation is
    PERSISTED so those references read the cache instead of
    recomputing the orders scan + agg."""
    from meteaudata_spark.ext import relational

    df = relational.orders_rfm_segments(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins
    plan = inspect.formatted_plan(df)
    assert "InMemoryTableScan" in plan, "customer relation not cached"
    assert "ArrowEvalPython" not in plan


def test_jaccard_histogram_reuses_memoized_pairs(spark):
    """doc_jaccard_histogram after doc_minhash_lsh_pairs: no new memo
    entry; one hash-agg on top of the shared pair relation."""
    from meteaudata_spark.ext import dedup
    from meteaudata_spark.plans import opcache

    dedup.doc_minhash_lsh_pairs(spark, SF).count()
    n_memo = len(opcache._memo)
    dedup.doc_jaccard_histogram(spark, SF).count()
    assert len(opcache._memo) == n_memo


def test_classifier_score_broadcasts_model(spark):
    # the weight table must ride as a broadcast (map-side join), and
    # scoring must stay at two keyed shuffles (doc-bucket count agg +
    # per-doc sum) — no sort-merge join against a 256-row model
    df = textstats.doc_classifier_score(spark, SF)
    joins = inspect.join_strategies(df)
    assert "BroadcastHashJoin" in joins, joins
    assert "SortMergeJoin" not in joins, joins
    assert "CartesianProduct" not in joins


def test_market_basket_no_cartesian_distributed_topk(spark):
    from meteaudata_spark.ext import relational

    df = relational.orders_market_basket(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins, joins
    plan = inspect.formatted_plan(df)
    # top-k must run distributed (TakeOrderedAndProject), never a
    # global Sort + Limit over the full pair relation
    assert "TakeOrderedAndProject" in plan, plan


def test_incremental_dedup_no_cartesian(spark):
    from meteaudata_spark.ext import dedup

    df = dedup.doc_incremental_dedup(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins, joins


def test_pr_curve_single_agg_no_cartesian(spark):
    # one keyed doc join + 11x threshold explode + ONE hash-agg; the
    # sweep must never plan per-threshold branches (11 re-reads of the
    # scored relation) or a cartesian against the threshold list
    df = textstats.doc_classifier_pr_curve(spark, SF)
    joins = inspect.join_strategies(df)
    assert "CartesianProduct" not in joins, joins
    plan = inspect.formatted_plan(df)
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 6, f"threshold sweep re-reads upstream: {scans} scans"


def test_recall_curve_joins_topk_relations_broadcast(spark):
    # both top-k relations are <= n_queries*kmax rows; the overlap
    # join and the ks spine join must both broadcast — the composition
    # must add ZERO sort-merge joins beyond its two upstream rankers
    from meteaudata_spark.ext import simsearch

    upstream_smj = sum(
        inspect.join_strategies(fn(spark, SF, n_queries=10, k=10)).count(
            "SortMergeJoin"
        )
        for fn in (simsearch.emb_cosine_topk, simsearch.emb_ivf_topk)
    )
    df = simsearch.emb_recall_curve(spark, SF)
    joins = inspect.join_strategies(df)
    assert joins.count("BroadcastHashJoin") >= 2, joins
    assert joins.count("SortMergeJoin") <= upstream_smj, joins
    assert "CartesianProduct" not in joins, joins


def test_key_skew_single_real_shuffle(spark):
    # the per-key count is the ONLY full-data shuffle; the histogram
    # agg and the ordered window run on the tiny count-distribution
    # relation (SinglePartition there is the documented 1-small-rel
    # exception, like the scalar broadcasts)
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.events_key_skew(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, f"events must be read once: {scans}"
    exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert exchanges <= 4, f"too many exchanges: {exchanges}"


def test_char_entropy_two_aggs_no_join_before_reduce(spark):
    # explode -> two map-side-combinable hash aggs; the lang join rides
    # a broadcast after the per-doc reduce, and text is read once
    df = textstats.doc_char_entropy(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, plan[:1500]
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 2, f"documents must be read at most twice: {scans}"


def test_bpe_merges_no_shuffle_before_pair_count(spark):
    # the zip rides inside the row: exactly one exchange (the pair
    # count agg) before the distributed top-k
    df = textstats.doc_bpe_merges(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert inspect.keyed_exchange_count(df) <= 1, plan[:1500]
    assert "Window" not in plan, "pairing must not use a per-doc window"


def test_dedup_agreement_reuses_both_memoized_miners(spark):
    # after both pair miners ran, the agreement report must add no new
    # memo entries (compose, don't recompute)
    from meteaudata_spark.ext import dedup
    from meteaudata_spark.plans import opcache

    dedup.doc_minhash_lsh_pairs(spark, SF).count()
    dedup.doc_simhash_near_pairs(spark, SF).count()
    n_memo = len(opcache._memo)
    dedup.doc_dedup_agreement(spark, SF).count()
    assert len(opcache._memo) == n_memo


def test_burst_detection_window_on_bucket_relation(spark):
    # the lag window must run on the hourly-bucket aggregate, never on
    # raw event rows: exactly one events scan, agg below the window
    df = tsq.ts_burst_detection(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, scans
    # HashAggregate appears before (deeper than) the Window node
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert 0 < win_pos, "window missing"
    assert plan.rfind("HashAggregate") > win_pos, "bucket agg must feed the window"


def test_cohort_ltv_two_keyed_aggs_no_window(spark):
    # cohort MIN + rollup: keyed hash aggs only; no window, no
    # cartesian; orders is scanned at most twice (cohort agg + join
    # side — AQE may reuse the exchange at runtime)
    from meteaudata_spark.ext import relational

    df = relational.orders_cohort_ltv(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans <= 2, f"orders read more than twice: {scans}"


def test_dip_spike_one_window_keyed_by_series(spark):
    # exactly ONE window (lag+lead share the frame) partitioned by the
    # high-cardinality (user, type) key — never a global order
    df = tsq.ts_dip_spike(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("( ") == 0  # sanity: formatted plan parsed
    import re

    windows = len(re.findall(r"\(\d+\) Window", plan))
    assert windows == 1, f"expected one window: {windows}"
    assert "user_id" in plan and "event_type" in plan


def test_boilerplate_no_pairs_no_window(spark):
    # C4 observability must stay keyed-agg shaped: no window, no
    # cartesian, and the per-source doc-count join is broadcast
    from meteaudata_spark.ext import dedup

    df = dedup.doc_boilerplate_report(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_zipf_window_on_vocab_relation_only(spark):
    # the rank window runs AFTER the (lang, token) count agg — its
    # input is vocabulary-sized, so an agg must appear below the window
    from meteaudata_spark.ext import textstats

    df = textstats.doc_zipf_fit(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    import re

    m_window = re.search(r"\(\d+\) Window", plan)
    assert m_window, "rank window missing"
    # a HashAggregate node must be planned below (= appear after in the
    # formatted operator list) the window's input subtree
    agg_ids = [int(x) for x in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_id = int(re.search(r"\((\d+)\) Window", plan).group(1))
    assert any(a < win_id for a in agg_ids), plan[:1500]


def test_pmi_marginals_broadcast(spark):
    # both unigram joins and the N scalar ride broadcasts; top-k is
    # distributed
    from meteaudata_spark.ext import textstats

    df = textstats.doc_pmi_bigrams(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" not in plan


def test_dsir_sample_weights_persisted_one_scalar_broadcast(spark):
    # the weights relation feeds both the max and the main branch: it
    # must be PERSISTED (InMemoryTableScan on both references) so the
    # explode+agg pipeline runs once; the only cross joins are 1-row
    # scalar broadcasts (the 256-bucket totals inside the cached
    # weights + the max normalizer)
    from meteaudata_spark.ext import textstats

    df = textstats.doc_dsir_sample(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert plan.count("InMemoryTableScan") >= 2, plan[:1500]
    import re

    bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert bnlj <= 2, f"only scalar broadcasts allowed: {bnlj}"
    assert "Window" not in plan


def test_ivf_balance_broadcast_assignment_only(spark):
    # same broadcast codebook join as the index build; the only other
    # joins are the 1-row total broadcast; no shuffle of pairs
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_ivf_balance(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # codebook + scalar total


def test_zorder_layout_map_side_keys(spark):
    # z-keys and bucket ids are row-local projections: the only join
    # is the 1-row anchor broadcast; per-layout rollups are keyed aggs
    # over 64-row relations — no window, no sort-merge join
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.events_zorder_layout(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    import re

    bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert bnlj <= 2, f"anchor broadcast only: {bnlj}"


def test_shuffle_shards_one_window_pruned_scan(spark):
    # shard + pos are hash-local: ONE window partitioned by shard over
    # a scan that reads nothing but the key column
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_shuffle_shards(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert inspect.scan_columns(df) == {"doc_id"}


def test_k_anonymity_single_corpus_pass(spark):
    # group sizes in ONE keyed agg; the k ladder explodes the tiny
    # group-size relation, never the corpus — one scan, no join, no
    # window
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_k_anonymity(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, scans


def test_corpus_datacard_broadcast_quality_join(spark):
    # the quality relation rides the session memo (InMemoryTableScan)
    # and joins on doc_id as a broadcast; per-lang rollup is one keyed
    # agg — no window, no sort-merge join
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_corpus_datacard(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "InMemoryTableScan" in plan  # memoized quality upstream


def test_windowed_dedup_single_agg_no_join(spark):
    # tumbling-hour dedup report: the distinct rides a struct key
    # inside ONE grouped aggregation chain — no join, no window
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.events_windowed_dedup(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Join" not in plan
    import re

    scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert scans == 1, scans


def test_hard_negatives_pushdown_broadcast_grouplimit(spark):
    # query filter reaches the parquet scan; the probe is a broadcast
    # of the 8 queries with the label exclusion in the join condition;
    # top-k uses WindowGroupLimit (partial rank pushdown before the
    # shuffle), never a global sort of all pairs
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_hard_negatives(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    pushed = inspect.pushed_filters(df)
    assert any("vec_id" in f and "LessThan" in f for f in pushed), pushed
    assert "WindowGroupLimit" in plan
    import re

    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) == 1


def test_mmr_rerank_one_arrow_stage_over_bounded_pool(spark):
    # corpus work = the memoized BM25 pass + one broadcast-pruned
    # token-set fetch; the greedy selection is ONE Arrow stage keyed by
    # query_id over ≤ Q·n_candidates rows — no sort-merge join, no
    # cartesian, no per-rank join ladder
    from meteaudata_spark.ext import textstats

    df = textstats.doc_mmr_rerank(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    import re

    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", plan)) == 1
    assert "InMemoryTableScan" in plan  # memoized candidate upstream

    # only scalar broadcasts (BM25's 1-row n_avg) may ride BNLJ
    bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert bnlj <= 2, f"only scalar broadcasts allowed: {bnlj}"


def test_bpe_encode_corpus_side_single_pass(spark):
    # the corpus side is one explode + keyed join + keyed agg: no
    # window over corpus-sized data, no cartesian; the vocab-sized
    # tokenization (localCheckpoint leaf) joins on the word key
    from meteaudata_spark.ext import textstats

    df = textstats.doc_bpe_encode(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_incremental_semdedup_no_cartesian(spark):
    # every shard delta joins on centroid_id (keyed), never cross
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_incremental_semdedup(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_mixture_plan_windows_on_domain_relation_only(spark):
    # ONE corpus agg; the share windows run on the |domains| relation
    # (an agg is planned below every window)
    import re

    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_mixture_plan(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    agg_ids = [int(x) for x in re.findall(r"\((\d+)\) HashAggregate", plan)]
    win_ids = [int(x) for x in re.findall(r"\((\d+)\) Window", plan)]
    assert win_ids and agg_ids
    assert any(a < min(win_ids) for a in agg_ids), plan[:1500]


def test_lsh_edit_verify_composes_memoized_pairs(spark):
    # the candidate relation is the memoized LSH miner (compose,
    # don't recompute) and the text joins are keyed id lookups —
    # never an all-pairs stage
    from meteaudata_spark.ext import dedup

    df = dedup.doc_lsh_edit_verify(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # memoized pair upstream


def test_sq_topk_broadcast_stats_and_queries_only(spark):
    # the 1-row min/max stats and the n_queries-row query side are
    # the only nested-loop builds; the corpus is never shuffled wide
    import re

    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_sq_topk(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan))
    assert bnlj <= 2, f"only stats+query broadcasts allowed: {bnlj}"


def test_readability_map_only_single_agg(spark):
    # one pruned scan (text+lang), partial agg map-side; exchanges =
    # the agg shuffle + the range exchange ordering the 5-row result
    from meteaudata_spark.ext import textstats

    df = textstats.doc_readability(spark, SF)
    cols = inspect.scan_columns(df)
    assert cols <= {"text", "lang"}, cols
    assert inspect.keyed_exchange_count(df) <= 2
    plan = inspect.formatted_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_license_detect_map_only_single_agg(spark):
    from meteaudata_spark.ext import textstats

    df = textstats.doc_license_detect(spark, SF)
    cols = inspect.scan_columns(df)
    assert cols <= {"text", "source"}, cols
    assert inspect.keyed_exchange_count(df) <= 2
    plan = inspect.formatted_plan(df)
    assert plan.count("HashAggregate") >= 2


def test_curriculum_stages_windows_on_bucket_relation_only(spark):
    # the cumulative window runs on the bounded score-bucket relation
    # (an aggregate is planned below it), the stage lookup joins are
    # broadcast, and there is no global row sort before the final
    # orderBy on the |stages|-row result
    from meteaudata_spark.ext import corpus_ops

    df = corpus_ops.doc_curriculum_stages(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    joins = inspect.join_strategies(df)
    assert "SortMergeJoin" not in joins
    # window input is the post-aggregate bucket relation: a
    # HashAggregate appears below the Window operator in the tree
    win_pos = plan.find("Window")
    assert win_pos > 0 and "HashAggregate" in plan[win_pos:]


def test_hll_sliding_map_side_fanout_no_smj(spark):
    # the window fan-out is a map-side Generate over the register
    # relation; the day-membership joins ride broadcasts; the merge
    # is partial-aggregated max — never a sort-merge join or cartesian
    from meteaudata_spark.ext import sketches

    df = sketches.events_hll_sliding_uniques(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "Generate" in plan  # the sequence() explode
    assert plan.count("BroadcastHashJoin") >= 2


def test_skipgram_pmi_map_side_pairs_broadcast_marginals(spark):
    # distance pooling is array zips (no positional self-join);
    # marginals + N broadcast; top-k distributed
    from meteaudata_spark.ext import textstats

    df = textstats.doc_skipgram_pmi(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" not in plan


def test_ohlc_single_agg_no_window(spark):
    # first/last as min_by/max_by aggregates: one keyed hash agg,
    # no per-group time sort
    from meteaudata_spark.ext import timeseries_queries as tsq

    df = tsq.ts_ohlc_daily(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan
    assert inspect.exchange_count(df) <= 2
    cols = inspect.scan_columns(df)
    assert cols <= {"ts", "event_id", "event_type", "value"}, cols


def test_ivf_topics_broadcast_assignment_and_vocab_window(spark):
    # assignment rides the codebook broadcast; df/N joins broadcast;
    # the rank window runs above a (list, token) aggregate, never on
    # corpus rows; no sort-merge join
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_ivf_topics(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    win_pos = plan.find("Window")
    assert win_pos > 0 and "HashAggregate" in plan[win_pos:]


def test_containment_pair_bounded_shingle_pass(spark):
    # the shingle recompute is semi-join bounded to pair docs: the
    # documents scan must sit under a join with the id relation, and
    # the memoized pair relation is reused
    from meteaudata_spark.ext import dedup

    df = dedup.doc_minhash_containment(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # memoized pairs upstream


def test_pareto_windows_on_band_relation_only(spark):
    # cumulative sweep runs on the bounded revenue-band relation (an
    # aggregate below the window); threshold fan-out is a broadcast
    from meteaudata_spark.ext import relational

    df = relational.orders_pareto_share(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    win_pos = plan.find("Window")
    assert win_pos > 0 and "HashAggregate" in plan[win_pos:]
    cols = inspect.scan_columns(df)
    assert cols <= {"o_custkey", "o_totalprice"}, cols


def test_jaccard_edit_calibration_lsh_bounded(spark):
    # DP runs only on the memoized LSH candidate relation; the band
    # aggregate is band-relation sized
    from meteaudata_spark.ext import dedup

    df = dedup.doc_jaccard_edit_calibration(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_hhi_fact_agg_then_broadcast_dims(spark):
    # one fact-side keyed agg; supplier/nation dims broadcast; no
    # window over fact rows
    from meteaudata_spark.ext import relational

    df = relational.orders_hhi_concentration(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    cols = inspect.scan_columns(df)
    assert "l_comment" not in cols and "l_orderkey" not in cols


def test_kmeans_train_broadcast_rounds_no_corpus_shuffle(spark):
    # every round's assignment is a broadcast nested-loop against the
    # k-row centroid relation; the only wide exchanges feed the
    # (k x dims) update aggregates — never a corpus sort-merge join
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_kmeans_train(spark, SF, rounds=3)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_active_uncertainty_bounded_window_output(spark):
    # scores are narrow; the per-lang ranking window is the only one
    from meteaudata_spark.ext import textstats

    df = textstats.doc_active_uncertainty(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_entropy_rate_map_side_pairs_keyed_aggs(spark):
    # adjacent-pair zip map-side; pair count and row marginal are
    # keyed aggs; no window, no cartesian
    from meteaudata_spark.ext import textstats

    df = textstats.doc_entropy_rate(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_heaps_fit_single_pass_conditional_sums(spark):
    # every checkpoint is a conditional-sum column: no explode by
    # checkpoint, no window, max-id rides a broadcast.  The corpus
    # pays exactly ONE shingle explode + aggregate (materialized via
    # localCheckpoint): the downstream plan reads the checkpointed
    # relation only — no parquet rescan, and the only Generate nodes
    # left are the lang-sized stack() pivots
    from meteaudata_spark.ext import textstats

    df = textstats.doc_heaps_fit(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Scan parquet" not in plan
    assert plan.count("Generate") <= 2


def test_unigram_lm_plan_vocab_bound(spark):
    # the trainer's emitted plan runs entirely on checkpointed
    # vocabulary-sized relations: the corpus parquet is scanned only
    # inside the one up-front word-count job, never in the final DAG;
    # no window, no cartesian product (the 1-row total rides a
    # broadcast nested loop, the repo's crossJoin(broadcast) idiom)
    from meteaudata_spark.ext import textstats

    df = textstats.doc_unigram_lm_train(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast 1-row total


def _lambda_bodies(plan: str) -> list[str]:
    # extract every balanced-paren lambdafunction(...) body from an
    # optimized-plan string
    out, i, tag = [], 0, "lambdafunction("
    while True:
        j = plan.find(tag, i)
        if j < 0:
            break
        k = j + len(tag)
        depth, s = 1, k
        while depth and k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        out.append(plan[s : k - 1])
        i = k
    return out


def test_no_split_inside_any_lambda(spark):
    # the O(words²) tripwire (VERDICT r12 #2): split(text) inside a
    # transform/filter lambda is re-evaluated by Catalyst once PER
    # ARRAY INDEX, turning an O(words) projection into O(words²) per
    # document — invisible to the sf0.1→sf1 row-count exponent guard
    # because the blowup is per-row, not per-rowcount.  House rule
    # (ext/dedup.py::_shingles): project split() to a __toks column
    # BEFORE the lambda.  CollapseProject keeps the separate Project
    # because split is non-cheap and multiply-referenced.  This guard
    # walks the OPTIMIZED plan (post-collapse) of every corpus query
    # that shingles/segments text and fails if any lambda body ever
    # contains a split( again.
    from meteaudata_spark.ext import corpus_ops, dedup, textstats
    from meteaudata_spark.plans.opcache import release_operator_caches

    # HERMETIC CACHE STATE (r14): the split ceilings assume each
    # query's shared relations are PERSISTED when its optimized plan
    # is walked (an InMemoryRelation hides its build plan).  Walking
    # thunks one at a time was not enough — a memo HIT returns a
    # relation whose INNER cache_intermediate persists may have been
    # FIFO-evicted by earlier suite churn, and the self-heal re-persist
    # then snapshots a cachedPlan with the inner build INLINED (seen as
    # "16 split() occurrences" on doc_minhash_lsh_pairs only after the
    # full suite ran).  Dropping every memo + persist first makes each
    # thunk build cold with fresh inner persists — deterministic plan
    # shape regardless of suite order.
    release_operator_caches()

    d = dedup._docs(spark, SF)
    cases = {
        "doc_substring_spans": lambda: dedup.doc_substring_spans(spark, SF),
        "substring_scrub": lambda: dedup.substring_scrub(d),
        "doc_boilerplate_report": lambda: dedup.doc_boilerplate_report(spark, SF),
        "doc_ngram_novelty": lambda: textstats.doc_ngram_novelty(spark, SF),
        "doc_heaps_fit": lambda: textstats.doc_heaps_fit(spark, SF),
        "doc_minhash_lsh_pairs": lambda: dedup.doc_minhash_lsh_pairs(spark, SF),
        "doc_winnow_fingerprints": lambda: dedup.doc_winnow_fingerprints(spark, SF),
        "doc_cdc_chunks": lambda: dedup.doc_cdc_chunks(spark, SF),
        "doc_segment_dedup": lambda: dedup.doc_segment_dedup(spark, SF),
        "doc_chunk_text": lambda: corpus_ops.doc_chunk_text(spark, SF),
    }
    # VERDICT r13 #2: ceilings on top-level split() occurrences per
    # optimized plan — a new redundant corpus re-tokenization (the
    # doc_winnow_fingerprints n_windows double this pins the fix of)
    # bumps the count and fails here.  For winnow specifically the
    # bound is one split PER SCAN (splits <= relation count).
    max_splits = {
        "doc_substring_spans": 2,
        "substring_scrub": 2,
        "doc_boilerplate_report": 2,
        "doc_ngram_novelty": 1,
        "doc_heaps_fit": 0,
        "doc_minhash_lsh_pairs": 4,
        "doc_winnow_fingerprints": 3,
        # r14 batch 3: the chunk relation is persisted (guide §5 —
        # both the share rollup and the per-doc rollup read it, so the
        # word explode + running-sum chain runs ONCE at runtime).  The
        # optimized-plan STRING prints the cachedPlan once per
        # InMemoryRelation reference: 2 references × 5 textual
        # split( occurrences (Project, Filter ×2, FileScan
        # DataFilters/PushedFilters) = 10 — still a single runtime
        # tokenization.  The persist precondition is asserted below;
        # dropping the persist (real double tokenization again) fails
        # that assertion, not just this ceiling.
        "doc_cdc_chunks": 10,
        "doc_segment_dedup": 1,
        "doc_chunk_text": 2,
    }
    # plans whose split ceiling assumes a cache_intermediate persist
    # of the tokenizing subtree: the ceiling counts cachedPlan PRINTS,
    # so it is only meaningful while the persist is actually there
    min_imr = {"doc_cdc_chunks": 2}
    offenders = {}
    for name, build in cases.items():
        df = build()
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        bad = [b[:120] for b in _lambda_bodies(opt) if "split(" in b]
        if bad:
            offenders[name] = bad
        n_split = opt.count("split(")
        if n_split > max_splits[name]:
            offenders[name] = offenders.get(name, []) + [
                f"{n_split} split() occurrences (ceiling "
                f"{max_splits[name]}) — redundant re-tokenization"
            ]
        if name == "doc_winnow_fingerprints":
            n_rel = opt.count("Relation")
            if n_split > n_rel:
                offenders[name] = offenders.get(name, []) + [
                    f"{n_split} splits > {n_rel} scans"
                ]
        if opt.count("InMemoryRelation") < min_imr.get(name, 0):
            offenders[name] = offenders.get(name, []) + [
                f"tokenizing subtree no longer persisted "
                f"({opt.count('InMemoryRelation')} InMemoryRelation refs"
                f" < {min_imr[name]}) — its split ceiling assumed the"
                " cache_intermediate"
            ]
    assert not offenders, (
        f"split() re-evaluated inside a lambda (O(words²)/doc) or "
        f"re-tokenization ceiling exceeded: {offenders}"
    )


def test_tokenizer_eval_plan_one_corpus_scan(spark):
    # the eval row joins the corpus explode against the (checkpointed,
    # vocabulary-sized) per-word Viterbi relation: exactly one parquet
    # scan (the corpus side), no window, no cartesian product — same
    # bound as the encode row it composes with
    from meteaudata_spark.ext import textstats

    import re

    for fn in (
        textstats.doc_tokenizer_eval,
        textstats.doc_unigram_lm_encode,
        textstats.doc_tokenizer_roundtrip,
    ):
        df = fn(spark, SF)
        plan = inspect.formatted_plan(df)
        # count scan NODES (the formatted detail section repeats each
        # node's name, so a raw substring count double-counts)
        n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        assert n_scans <= 1, (fn.__name__, n_scans)
        assert "Window" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__


def test_no_presentation_sort_on_swept_gate_rows(spark):
    """r14 batch 6 (guide §2.4): the driver's value gate is row-order-
    insensitive (certified no-sort rows hash-match ORDER BY oracles
    every round), so a trailing global orderBy is a pure presentation
    cost — a range exchange whose partitioner re-executes everything
    above the last shuffle to sample sort bounds.  Guard a
    representative row per swept family so the Sort+rangepartitioning
    pair cannot quietly return."""
    from meteaudata_spark.ext import (
        corpus_ops,
        dedup,
        multimodal,
        profile,
        simsearch,
        sketches,
    )

    rows = [
        simsearch.emb_ivfpq_probe_sweep,
        simsearch.emb_sq_topk,
        relational.orders_rfm_segments,
        tsq.ts_anomaly_consensus,
        textstats.doc_perplexity_buckets,
        dedup.doc_cdc_chunks,
        corpus_ops.events_zorder_layout,
        sketches.events_hll_sliding_uniques,
        multimodal.mm_audio_vad,
        profile.lineitem_profile,
    ]
    for fn in rows:
        plan = inspect.formatted_plan(fn(spark, SF))
        assert "rangepartitioning" not in plan, (
            f"{fn.__name__}: presentation sort reintroduced"
        )
