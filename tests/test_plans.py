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
    """The LSH bucket stage must stay a narrow map — no exchange
    before the per-bucket grouping."""
    from meteaudata_spark.ext import simsearch

    df = simsearch.emb_lsh_buckets(spark, SF)
    assert inspect.exchange_count(df) == 0, inspect.formatted_plan(df)


def test_ngram_jaccard_joins_on_long_keys(spark):
    """The shingle self-join must run on hashed BIGINT keys, not raw
    shingle strings (string shuffles dominate at scale)."""
    from meteaudata_spark.ext import dedup

    df = dedup.doc_ngram_jaccard_pairs(spark, SF)
    plan = inspect.formatted_plan(df)
    assert "xxhash64" in plan, plan[:2000]


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
