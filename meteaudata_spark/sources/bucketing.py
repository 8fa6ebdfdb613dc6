"""Bucketed-table helpers: co-located fact⋈fact joins without a
shuffle.

At 100 TB the orders⋈lineitem join dominates unless both sides are
pre-bucketed on the join key: `bucketBy(n, key)` writes each table
hash-partitioned into the same bucket layout, so Spark's scan emits
the join key distribution directly and the SortMergeJoin needs NO
Exchange on either side (verified by plan test).

Bucketing requires the table catalog (`saveAsTable`) — plain
`.parquet(path)` writes don't retain bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a table dir orphaned by a previous session's metastore blocks
    # saveAsTable even in overwrite mode — clear it
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join_demo(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> DataFrame:
    """Write orders+lineitem bucketed on the order key, return the
    co-located join's revenue-per-orderpriority aggregate.

    The join carries NO Exchange on either side — see
    tests/test_bucketing.py for the plan assertion.
    """
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets)
    write_bucketed(li, "lineitem_b", "l_orderkey", n_buckets)
    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    # merge hint: at tiny test scale the planner would broadcast (which
    # ignores bucketing); at fact-x-fact scale SMJ is what it picks
    # anyway, and THAT is the plan the bucket layout de-shuffles
    return (
        lb.join(ob.hint("merge"), lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("o_orderpriority")
    )
