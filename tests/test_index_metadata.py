"""Index metadata extract → flatten → reconstruct round-trips per index
type (reference tests/test_index_metadata.py:94-211)."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.functions.indexmeta import (
    extract_index_metadata,
    index_to_column,
    reconstruct_index,
)


def _roundtrip(index: pd.Index) -> pd.Index:
    meta = extract_index_metadata(index)
    col = index_to_column(index)
    return reconstruct_index(col, meta), meta


def test_datetime_naive():
    idx = pd.date_range("2020-01-01", periods=3, freq="D", name="time")
    back, meta = _roundtrip(idx)
    assert meta.type == "DatetimeIndex"
    assert meta.frequency == "D"
    assert meta.time_zone is None
    assert (back == idx).all()
    assert back.name == "time"


def test_datetime_tz():
    idx = pd.date_range("2020-01-01", periods=3, freq="D", tz="UTC")
    back, meta = _roundtrip(idx)
    assert meta.time_zone == "UTC"
    assert (back == idx).all()
    assert str(back.tz) == "UTC"


def test_datetime_tz_nonutc():
    idx = pd.date_range("2020-01-01", periods=3, freq="D", tz="America/Montreal")
    back, meta = _roundtrip(idx)
    assert meta.time_zone == "America/Montreal"
    assert (back == idx).all()


def test_float64():
    idx = pd.Index([0.1, 0.2, 0.3], name="f")
    back, meta = _roundtrip(idx)
    assert meta.dtype == "float64"
    assert np.allclose(back.values, idx.values)


def test_int64():
    idx = pd.Index([1, 2, 3])
    back, meta = _roundtrip(idx)
    assert meta.dtype == "int64"
    assert (back == idx).all()


def test_range():
    idx = pd.RangeIndex(start=0, stop=6, step=2)
    back, meta = _roundtrip(idx)
    assert meta.type == "RangeIndex"
    assert (meta.start, meta.end, meta.step) == (0, 6, 2)
    assert isinstance(back, pd.RangeIndex)
    assert (back == idx).all()


def test_categorical():
    idx = pd.CategoricalIndex(["a", "b", "c"], ordered=False)
    back, meta = _roundtrip(idx)
    assert meta.categories == ["a", "b", "c"]
    assert meta.ordered is False
    assert isinstance(back, pd.CategoricalIndex)
    assert (back == idx).all()


def test_period():
    idx = pd.period_range("2020-01", periods=3, freq="M")
    back, meta = _roundtrip(idx)
    assert meta.type == "PeriodIndex"
    assert meta.frequency == "M"
    assert isinstance(back, pd.PeriodIndex)
    assert (back == idx).all()


def test_spark_roundtrip_preserves_datetime(spark, provenance):
    from meteaudata_spark.signal import Signal

    idx = pd.date_range("2020-01-01", periods=5, freq="6min", tz="America/Montreal")
    ser = pd.Series(np.arange(5, dtype="float64"), index=idx, name="RAW")
    sig = Signal(input_data=ser, name="T", units="x", provenance=provenance, spark=spark)
    got = sig.time_series["T#1_RAW#1"].to_pandas()
    assert (got.index == idx).all()
    assert str(got.index.tz) == "America/Montreal"


def test_spark_roundtrip_int_index(spark, provenance):
    from meteaudata_spark.signal import Signal

    ser = pd.Series([1.0, 2.0, 3.0], index=pd.Index([10, 20, 30]), name="RAW")
    sig = Signal(input_data=ser, name="I", units="x", provenance=provenance, spark=spark)
    got = sig.time_series["I#1_RAW#1"].to_pandas()
    assert (got.index == ser.index).all()
    assert np.allclose(got.values, ser.values)


def test_empty_datetime_series_ingest_schema(spark):
    """Empty ingest derives schema from index/value dtype (ADVICE r1):
    an empty datetime float series must union cleanly with a non-empty
    one instead of materializing as (bigint, string)."""
    import numpy as np
    from meteaudata_spark.timeseries import TimeSeries

    empty = TimeSeries.from_pandas(
        spark, pd.Series([], index=pd.DatetimeIndex([]), dtype="float64")
    )
    assert dict(empty.df.dtypes) == {"timestamp": "timestamp", "value": "double"}

    idx = pd.date_range("2020-01-01", freq="5min", periods=3)
    full = TimeSeries.from_pandas(spark, pd.Series([1.0, 2.0, 3.0], index=idx))
    merged = empty.df.unionByName(full.df)
    assert merged.count() == 3

    empty_int = TimeSeries.from_pandas(spark, pd.Series([], dtype="int64"))
    assert dict(empty_int.df.dtypes) == {"timestamp": "bigint", "value": "bigint"}
