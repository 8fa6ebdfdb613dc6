"""Structured Streaming operators vs their batch kernels."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.operators import kernels
from meteaudata_spark.streaming.resample_stream import (
    stream_resample_mean,
    stream_sessionize,
)


@pytest.fixture()
def event_stream_dir(spark, tmp_path):
    rng = np.random.default_rng(11)
    idx = pd.date_range("2024-01-01", freq="37s", periods=500)
    pdf = pd.DataFrame(
        {
            "event_type": ["a" if i % 2 else "b" for i in range(500)],
            "timestamp": idx,
            "value": rng.standard_normal(500),
        }
    )
    path = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf).write.parquet(path)
    return path, pdf


def test_stream_resample_matches_batch(spark, event_stream_dir):
    path, pdf = event_stream_dir
    batch_df = spark.read.parquet(path)
    schema = batch_df.schema

    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_resample_mean(
        stream, "5min", partition_cols=["event_type"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("resampled")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("resampled")
        .orderBy("event_type", "timestamp")
        .toPandas()
    )

    # batch oracle: same tumbling windows (F.window is epoch-aligned,
    # matching the streaming window; compare against pandas resample
    # with origin='epoch' per group)
    ref_parts = []
    for key, grp in pdf.groupby("event_type"):
        ser = pd.Series(grp["value"].values, index=grp["timestamp"])
        r = ser.resample("5min", origin="epoch").mean().dropna()
        ref_parts.append(
            pd.DataFrame(
                {"event_type": key, "timestamp": r.index, "value": r.values}
            )
        )
    ref = (
        pd.concat(ref_parts)
        .sort_values(["event_type", "timestamp"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref)
    assert np.allclose(got["value"].values, ref["value"].values)


def test_stream_sessionize_runs(spark, event_stream_dir):
    path, _ = event_stream_dir
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_sessionize(
        stream.withColumnRenamed("event_type", "user_id"),
        gap="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sessions").toPandas()
    assert len(got) >= 2
    assert set(got.columns) == {"user_id", "session_start", "session_end", "n_events"}
