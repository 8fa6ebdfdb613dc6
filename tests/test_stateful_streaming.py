"""applyInPandasWithState: state must carry across micro-batches."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.streaming.stateful import stream_running_stats


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    rng = np.random.default_rng(13)
    src = str(tmp_path / "src")
    # two files -> (with maxFilesPerTrigger=1) two micro-batches
    pdf1 = pd.DataFrame(
        {"event_type": ["x"] * 50 + ["y"] * 30, "value": rng.normal(10, 2, 80)}
    )
    pdf2 = pd.DataFrame(
        {"event_type": ["x"] * 20, "value": rng.normal(10, 2, 20)}
    )
    spark.createDataFrame(pdf1).coalesce(1).write.parquet(src)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_running_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("running").toPandas()

    # final cumulative row per key must equal the full-dataset stats
    all_pdf = pd.concat([pdf1, pdf2])
    for key, grp in all_pdf.groupby("event_type"):
        rows = got[got["key"] == key]
        final = rows.loc[rows["n_total"].idxmax()]
        assert final["n_total"] == len(grp)
        assert abs(final["mean"] - grp["value"].mean()) < 1e-9
        assert abs(final["variance"] - grp["value"].var(ddof=1)) < 1e-9
    # state actually crossed batches: key x appears with two cumulative counts
    x_counts = sorted(got[got["key"] == "x"]["n_total"])
    assert x_counts == [50, 70]


def test_stream_hll_matches_batch(spark, tmp_path):
    """Drained-stream HLL estimate must EQUAL the batch operator's on
    the same rows (same integer registers, same final division)."""
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.dedup import _h60
    from meteaudata_spark.ext.sketches import hll_distinct
    from meteaudata_spark.streaming.hll_stream import stream_hll_distinct

    src = str(tmp_path / "hll_src")
    base = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("key"),
        F.pmod(_h60((F.col("id") % 5000).cast("string")), F.lit(1 << 60)).alias("h"),
    )
    # two files -> two micro-batches
    base.filter(F.col("id") % 4 < 2).coalesce(1).write.parquet(src)
    base.filter(F.col("id") % 4 >= 2).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hll_distinct(stream)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hll_stream").toPandas()

    batch = {
        r["grp"]: r["hll_distinct"]
        for r in hll_distinct(spark.read.parquet(src).withColumnRenamed("key", "grp"), "grp").collect()
    }
    for key in ("a", "b"):
        rows = got[got["key"] == key]
        # last emitted row per key = cumulative estimate
        final_est = rows.iloc[-1]["hll_distinct"]
        assert final_est == batch[key], (key, final_est, batch[key])
