"""Streaming ingestion into the native store: stream → Parquet series
dir → Signal.load round trip, with exactly-once restart semantics."""

import numpy as np
import pandas as pd

from meteaudata_spark import viz
from meteaudata_spark.signal import Signal
from meteaudata_spark.sources import store
from meteaudata_spark.streaming.sink import stream_to_series_store


def test_stream_ingest_then_load(spark, provenance, tmp_path):
    # bootstrap a signal whose series will be stream-fed
    idx = pd.date_range("2024-01-01", freq="1min", periods=10)
    seed = pd.Series(np.arange(10.0), index=idx, name="RAW")
    sig = Signal(
        input_data=seed, name="LIVE", units="x",
        provenance=provenance, spark=spark,
    )
    sig_dir = store.save_signal(sig, str(tmp_path))

    # stream two more files of data into the same series dir
    src = str(tmp_path / "incoming")
    later = pd.date_range("2024-01-01 00:10:00", freq="1min", periods=20)
    pdf = pd.DataFrame({"timestamp": later, "value": np.arange(10.0, 30.0)})
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_to_series_store(stream, sig_dir, "LIVE#1_RAW#1")
    q.awaitTermination(120)

    loaded = store.load_signal(spark, sig_dir)
    got = loaded.time_series["LIVE#1_RAW#1"].to_pandas()
    assert len(got) == 30
    assert got.values.tolist() == list(map(float, range(30)))

    # restart with the same checkpoint: no duplicates (exactly-once)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = stream_to_series_store(stream2, sig_dir, "LIVE#1_RAW#1")
    q2.awaitTermination(120)
    again = store.load_signal(spark, sig_dir)
    assert again.time_series["LIVE#1_RAW#1"].count() == 30


def test_dataset_plot_spec(spark, provenance):
    from meteaudata_spark.dataset import Dataset

    idx = pd.date_range("2020-01-01", freq="1min", periods=30)
    sigs = {}
    for n in ["A", "B"]:
        s = Signal(
            input_data=pd.Series(np.arange(30.0), index=idx, name="RAW"),
            name=n, units="x", provenance=provenance, spark=spark,
        )
        sigs[s.name] = s
    ds = Dataset(name="d", signals=sigs)
    result = viz.plot_dataset(ds)
    if isinstance(result, dict):
        assert set(result) == {"A#1", "B#1"}
        assert result["A#1"]["data"][0]["name"] == "A#1_RAW#1"
