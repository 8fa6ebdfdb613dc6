"""Edge-case hardening for the round-7 operators: empty inputs,
degenerate groups, over-sized parameters."""

from pyspark.sql import functions as F


def test_profile_handles_all_null_column(spark):
    from meteaudata_spark.ext.profile import profile_table

    d = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v double"
    )
    out = {
        r["column_name"]: r
        for r in profile_table(d, [("k", "num"), ("v", "num")]).collect()
    }
    assert out["v"]["n_null"] == 2
    assert out["v"]["n_distinct"] == 0
    assert out["v"]["min_num"] is None and out["v"]["max_num"] is None


def test_matryoshka_prefix_clamps_to_dim(spark):
    from meteaudata_spark.ext.simsearch import matryoshka_topk

    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    # prefix wider than the vector: slice clamps, ranking still total
    got = matryoshka_topk(d, n_queries=1, k=2, prefix_dims=64).collect()
    assert len(got) == 2


def test_table_diff_multi_column_key(spark):
    from meteaudata_spark.ext.relational import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 20.0)], "k1 long, k2 string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 11.0), (2, "a", 30.0)], "k1 long, k2 string, v double"
    )
    got = {
        (r["k1"], r["k2"]): r["status"]
        for r in table_diff(old, new, ["k1", "k2"], ["v"]).collect()
    }
    assert got[(1, "a")] == "changed"
    assert got[(1, "b")] == "removed"
    assert got[(2, "a")] == "added"


def test_group_sample_small_groups_keep_all(spark):
    from meteaudata_spark.ext.corpus_ops import group_sample_exact

    d = spark.createDataFrame(
        [(i, "short" if i < 3 else "long") for i in range(103)],
        "doc_id long, lang string",
    )
    out = group_sample_exact(d, "lang", 20).collect()
    per = {}
    for r in out:
        per[r["lang"]] = per.get(r["lang"], 0) + 1
    assert per["short"] == 3  # fewer than k → all kept
    assert per["long"] == 20


def test_merge_partials_with_empty_delta(spark):
    from meteaudata_spark.ext.timeseries_queries import (
        merge_partials,
        rollup_partials,
    )

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "click", 2.0)],
        "event_id long, ts string, event_type string, value double",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )
    base = rollup_partials(ev)
    delta = rollup_partials(ev.filter(F.lit(False)))
    merged = merge_partials(base, delta).collect()
    assert len(merged) == 1 and merged[0]["n"] == 1


def test_holt_winters_single_point(spark):
    from meteaudata_spark.operators.kernels import holt_winters

    d = spark.createDataFrame(
        [("a", 0, 5.0)], "k string, b1h long, value double"
    )
    out = holt_winters(
        d, m=24, ts_col="b1h", val_col="value", partition_cols=["k"]
    ).collect()
    assert len(out) == 1
    assert out[0]["__level"] == 5.0 and out[0]["__trend"] == 0.0
    assert out[0]["__forecast_next"] == 5.0


def test_fk_orphans_empty_parent(spark):
    from meteaudata_spark.ext.profile import fk_orphans

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([], "pk long")
    assert fk_orphans(child, parent, "fk", "pk").count() == 2


def test_image_neardup_empty_and_single(spark):
    import numpy as np
    import pandas as pd

    from meteaudata_spark.ext.multimodal import (
        encode_ppm,
        image_ahash_blocks,
        image_neardup_pairs,
    )

    one = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1],
                "payload": [
                    encode_ppm(
                        np.zeros((8, 8, 3), dtype=np.uint8) + 7
                    )
                ],
            }
        )
    )
    assert image_neardup_pairs(image_ahash_blocks(one)).count() == 0
