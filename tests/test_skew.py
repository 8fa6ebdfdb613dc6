"""Salted join: equivalence with the plain join and partition spread."""

import numpy as np
import pandas as pd


def test_salted_join_equals_plain_join(spark):
    from meteaudata_spark.ext.skew import salted_join

    rng = np.random.default_rng(7)
    # pathological skew: 90% of left rows share one key
    left = pd.DataFrame(
        {
            "k": ["hot"] * 900 + [f"k{i}" for i in range(100)],
            "v": rng.standard_normal(1000),
        }
    )
    right = pd.DataFrame(
        {
            "k": ["hot"] + [f"k{i}" for i in range(100)] + ["unmatched"],
            "w": np.arange(102.0),
        }
    )
    l, r = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = l.join(r, ["k"]).toPandas().sort_values(["k", "v"]).reset_index(drop=True)
    salted = (
        salted_join(l, r, ["k"], n_salts=8)
        .toPandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert len(plain) == len(salted) == 1000
    assert (plain["k"].values == salted["k"].values).all()
    assert np.allclose(plain["w"].values, salted["w"].values)


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.skew import salted_join

    left = spark.range(10000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = salted_join(left, right, ["k"], n_salts=8)
    # the join key space is (k, salt): 8 distinct keys instead of 1
    n_salts_used = (
        left.withColumn(
            "__salt", F.pmod(F.xxhash64("k", "v"), F.lit(8))
        ).select("__salt").distinct().count()
    )
    assert n_salts_used == 8
    assert out.count() == 10000
