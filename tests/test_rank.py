"""Differential tests for the distributed global rank / NTILE
reconstruction (operators/rank.py) against Spark's own single-window
implementation — the two must be bit-identical on every input,
including heavy value ties and n < k edge cases."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from meteaudata_spark.operators.rank import global_rank, ntile_from_rank


def _cases():
    rng = random.Random(7)
    yield [(i, float(rng.randint(0, 50))) for i in range(500)]  # many ties
    yield [(i, rng.random() * 1e6) for i in range(1000)]  # distinct
    yield [(i, 1.0) for i in range(10)]  # all-equal values
    yield [(0, 3.5), (1, 2.5)]  # n < k
    yield [(0, 1.0)]  # single row


@pytest.mark.parametrize("ascending", [True, False])
def test_global_rank_matches_window_row_number(spark, ascending):
    for rows in _cases():
        df = spark.createDataFrame(rows, "id bigint, v double")
        order = (F.col("v").asc() if ascending else F.col("v").desc()), F.col("id")
        w = Window.orderBy(*order)
        expected = {
            r["id"]: r["rk"]
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        got = {
            r["id"]: r["rank"]
            for r in global_rank(
                df, "v", ascending=ascending, tiebreak_cols=["id"], n_buckets=8
            ).collect()
        }
        assert got == expected


@pytest.mark.parametrize("k", [2, 3, 4, 7])
def test_ntile_reconstruction_matches_spark_ntile(spark, k):
    for rows in _cases():
        df = spark.createDataFrame(rows, "id bigint, v double")
        w = Window.orderBy(F.col("v").desc(), F.col("id"))
        expected = {
            r["id"]: r["nt"]
            for r in df.withColumn("nt", F.ntile(k).over(w)).collect()
        }
        ranked = global_rank(
            df, "v", ascending=False, tiebreak_cols=["id"], n_buckets=8
        )
        total = df.agg(F.count(F.lit(1)).alias("__n"))
        got = {
            r["id"]: r["nt"]
            for r in ranked.crossJoin(F.broadcast(total))
            .withColumn("nt", ntile_from_rank(F.col("rank"), F.col("__n"), k))
            .collect()
        }
        assert got == expected


@pytest.mark.parametrize("ascending", [True, False])
def test_global_rank_null_values_match_window(spark, ascending):
    # NULLs must land where the window order puts them: asc → NULLS
    # FIRST, desc → NULLS LAST (Spark defaults)
    rng = random.Random(11)
    rows = [
        (i, None if i % 7 == 0 else float(rng.randint(0, 20)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id bigint, v double")
    order = (F.col("v").asc() if ascending else F.col("v").desc()), F.col("id")
    expected = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    got = {
        r["id"]: r["rank"]
        for r in global_rank(
            df, "v", ascending=ascending, tiebreak_cols=["id"], n_buckets=8
        ).collect()
    }
    assert got == expected
