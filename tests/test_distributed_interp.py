"""Distributed (chunked) interpolation must match the single-window
kernel and pandas exactly — including null runs spanning whole chunks."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from meteaudata_spark.operators import kernels

_SPARK = None


@pytest.fixture(autouse=True)
def _grab_spark(spark):
    global _SPARK
    _SPARK = spark


def _to_spark(ser):
    return _SPARK.createDataFrame(
        pd.DataFrame({"timestamp": ser.index, "value": ser.values})
    )


def _run(ser, chunk_seconds):
    got = (
        kernels.interpolate_linear_distributed(
            _to_spark(ser), chunk_seconds=chunk_seconds
        )
        .orderBy("timestamp")
        .toPandas()["value"]
        .values
    )
    return got


def test_matches_pandas_many_chunks(spark):
    rng = np.random.default_rng(9)
    vals = rng.standard_normal(500)
    vals[rng.integers(0, 500, 150)] = np.nan
    ser = pd.Series(
        vals, index=pd.date_range("2020-01-01", freq="1min", periods=500)
    )
    # 10-minute chunks -> 50 chunks
    got = _run(ser, 600.0)
    ref = ser.interpolate(method="linear").values
    assert np.allclose(got, ref, equal_nan=True)


def test_null_runs_spanning_chunks(spark):
    vals = [1.0] + [np.nan] * 40 + [5.0] + [np.nan] * 20
    ser = pd.Series(
        vals, index=pd.date_range("2020-01-01", freq="1min", periods=len(vals))
    )
    got = _run(ser, 300.0)  # 5-min chunks: null runs cross many chunks
    ref = ser.interpolate(method="linear").values
    assert np.allclose(got, ref, equal_nan=True)


def test_leading_nulls_stay_null_across_chunks(spark):
    vals = [np.nan] * 25 + [3.0, np.nan, 7.0]
    ser = pd.Series(
        vals, index=pd.date_range("2020-01-01", freq="1min", periods=len(vals))
    )
    got = _run(ser, 300.0)
    ref = ser.interpolate(method="linear").values
    assert np.allclose(got, ref, equal_nan=True)
    assert np.isnan(got[:25]).all()


@given(
    values=st.lists(
        st.one_of(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.just(float("nan")),
        ),
        min_size=2,
        max_size=60,
    ),
    chunk_seconds=st.sampled_from([120.0, 300.0, 900.0]),
)
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distributed_equals_single_window(values, chunk_seconds):
    ser = pd.Series(
        values,
        index=pd.date_range("2020-01-01", freq="1min", periods=len(values)),
    )
    dist = _run(ser, chunk_seconds)
    single = (
        kernels.interpolate_linear(_to_spark(ser))
        .orderBy("timestamp")
        .toPandas()["value"]
        .values
    )
    assert np.allclose(dist, single, equal_nan=True)


def test_ewma_distributed_matches_plain_kernel(spark):
    """Chunked EWMA must equal the single-pass kernel exactly —
    including NaN runs, an empty chunk (gap > chunk span), and
    leading NaNs."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.operators import kernels

    rng = np.random.default_rng(21)
    n = 5000
    idx = pd.date_range("2024-01-01", freq="1min", periods=n)
    vals = rng.standard_normal(n)
    vals[:7] = np.nan           # leading NaNs
    vals[100:160] = np.nan      # interior NaN run
    pdf = pd.DataFrame({"timestamp": idx, "value": vals})
    # empty chunk: drop two whole hours of rows
    pdf = pdf[~((pdf.timestamp >= "2024-01-01 10:00") & (pdf.timestamp < "2024-01-01 12:00"))]
    sdf = spark.createDataFrame(pdf)

    plain = (
        kernels.ewma(sdf, alpha=0.23)
        .toPandas().sort_values("timestamp").reset_index(drop=True)
    )
    dist = (
        kernels.ewma_distributed(sdf, alpha=0.23, chunk_seconds=3600.0)
        .toPandas().sort_values("timestamp").reset_index(drop=True)
    )
    assert len(plain) == len(dist)
    assert np.allclose(
        plain["value"].values, dist["value"].values, equal_nan=True, rtol=1e-9
    )
    ref = pd.Series(pdf["value"].values).ewm(alpha=0.23, adjust=False, ignore_na=True).mean()
    assert np.allclose(dist["value"].values, ref.values, equal_nan=True, rtol=1e-9)
