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


@pytest.mark.parametrize(
    "make_index, expect_dtype",
    [
        (
            lambda: pd.interval_range(
                start=0.0, end=4.0, freq=1.0, closed="left", name="iv"
            ),
            "interval[float64, left]",
        ),
        (
            lambda: pd.interval_range(start=0, periods=3, closed="both", name="iv"),
            "interval[int64, both]",
        ),
        (
            lambda: pd.interval_range(
                start=pd.Timestamp("2020-01-01"), periods=3, freq="D", name="iv"
            ),
            "interval[datetime64[ns], right]",
        ),
        (
            lambda: pd.IntervalIndex.from_arrays(
                [0.5, 2.5], [1.5, 4.0], closed="neither", name="iv"
            ),
            "interval[float64, neither]",
        ),
    ],
)
def test_interval_roundtrip(make_index, expect_dtype):
    """IntervalIndex parity (reference types.py:109-110,149-150): the
    (left, right) struct column + the recorded closed side rebuild the
    exact index for every closed variant and subtype."""
    idx = make_index()
    back, meta = _roundtrip(idx)
    assert meta.type == "IntervalIndex"
    assert meta.dtype == expect_dtype
    assert meta.closed == idx.closed
    assert isinstance(back, pd.IntervalIndex)
    assert back.closed == idx.closed
    assert back.name == "iv"
    assert back.equals(idx), (back, idx)


def test_spark_roundtrip_interval_index(spark, provenance):
    """End-to-end through the Spark plane: interval-indexed series
    ingest → struct column → collect → exact IntervalIndex back."""
    from meteaudata_spark.signal import Signal

    idx = pd.interval_range(start=0.0, end=3.0, freq=1.0, closed="left")
    ser = pd.Series([1.0, 2.0, 3.0], index=idx, name="RAW")
    sig = Signal(input_data=ser, name="V", units="x", provenance=provenance, spark=spark)
    got = sig.time_series["V#1_RAW#1"].to_pandas()
    assert isinstance(got.index, pd.IntervalIndex)
    assert got.index.closed == "left"
    assert got.index.equals(idx)
    assert np.allclose(got.values, ser.values)


def test_empty_interval_series_ingest_schema(spark):
    """Empty interval-indexed ingest declares struct<left,right> from
    the recorded subtype so it unions with non-empty series."""
    from meteaudata_spark.timeseries import TimeSeries

    empty = TimeSeries.from_pandas(
        spark,
        pd.Series(
            [],
            index=pd.IntervalIndex.from_arrays(
                np.array([], dtype="float64"),
                np.array([], dtype="float64"),
                closed="left",
            ),
            dtype="float64",
        ),
    )
    assert dict(empty.df.dtypes) == {
        "timestamp": "struct<left:double,right:double>",
        "value": "double",
    }
