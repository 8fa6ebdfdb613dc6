"""Bucketed co-located join: the join itself must run with NO shuffle
exchange on either input (the 100 TB fact-join strategy)."""

import re

import pytest

from meteaudata_spark.plans import inspect
from meteaudata_spark.sources.bucketing import bucketed_join_demo

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark


def test_bucketed_join_has_no_join_exchange(warehouse):
    spark = warehouse
    df = bucketed_join_demo(spark, SF, n_buckets=4)
    plan = inspect.formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan
    # only the post-join aggregation + final sort may shuffle: the join
    # inputs come straight from the bucketed scans
    assert inspect.exchange_count(df) == 2, plan
    # and no Exchange node sits between the scans and the join in the tree
    tree = plan[: plan.find("(1) Scan")]
    join_line = next(
        i for i, ln in enumerate(tree.splitlines()) if "SortMergeJoin" in ln
    )
    below_join = "\n".join(tree.splitlines()[join_line + 1 :])
    assert "Exchange" not in below_join, tree


def test_bucketed_join_values_match_unbucketed(warehouse):
    spark = warehouse
    from pyspark.sql import functions as F

    bucketed = bucketed_join_demo(spark, SF, n_buckets=4).toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("o_orderpriority")
        .toPandas()
    )
    assert bucketed.equals(plain)
