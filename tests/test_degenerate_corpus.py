"""ANSI-mode landmine sweep: every events-table query must survive a
CONSTANT-value corpus (zero variance, zero IQR, zero MAE — the
degenerate statistics that turn unguarded divisions into
DIVIDE_BY_ZERO job failures under Spark's default ANSI mode).

This sweep found a real crash in ts_robust_zscore/ts_anomaly_consensus
(fixed with explicit zero-IQR guards); it now pins every ts_* query.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def const_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("const"))
    spark.range(600).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,0,0,"
            "cast(id*5 as int),0)"
        ).alias("ts"),
        (F.col("id") % 3).alias("user_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias(
            "event_type"
        ),
        F.lit(42.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(f"{sf}/events.parquet")
    # minimal orders table for the as-of queries
    spark.range(10).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 3).alias("o_custkey"),
        F.expr(
            "timestamp '2024-01-01' + make_interval(0,0,0,0,cast(id as int),0,0)"
        ).alias("o_orderdate"),
        F.lit("O").alias("o_orderstatus"),
        F.lit(100.0).alias("o_totalprice"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.parquet(f"{sf}/orders.parquet")
    return sf


def test_every_events_query_survives_constant_values(const_sf, spark):
    import __spark_entry__ as e

    failures = []
    for name, fn in e.queries().items():
        if not name.startswith("ts_"):
            continue
        try:
            fn(spark, const_sf).count()
        except Exception as ex:
            failures.append((name, str(ex).splitlines()[0][:120]))
    assert not failures, failures
