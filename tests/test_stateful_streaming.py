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
