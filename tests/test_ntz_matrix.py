"""Timestamp-flavor matrix: every time-arithmetic kernel must produce
identical results whether its input column arrived as TIMESTAMP_NTZ
(tz-naive parquet — how the driver's testdata reads today), TIMESTAMP
LTZ (createDataFrame from pandas), or a CSV-parsed timestamp.  Round 3
broke six queries purely because the input flavor shifted — this
pins the whole class down."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from meteaudata_spark.operators import kernels


@pytest.fixture(scope="module")
def flavors(spark, tmp_path_factory):
    """The same 300-row irregular series in all three input flavors."""
    rng = np.random.default_rng(11)
    idx = pd.Timestamp("2021-03-01") + pd.to_timedelta(
        np.cumsum(rng.integers(30, 600, size=300)), unit="s"
    )
    vals = rng.normal(size=300)
    vals[rng.integers(0, 300, size=40)] = np.nan
    pdf = pd.DataFrame({"timestamp": idx, "value": vals})

    pq = str(tmp_path_factory.mktemp("ntz") / "series.parquet")
    # tz-naive µs (like the driver's testdata) → Spark reads TIMESTAMP_NTZ
    pdf.to_parquet(pq, coerce_timestamps="us", allow_truncated_timestamps=True)
    ntz = spark.read.parquet(pq)

    ltz = spark.createDataFrame(pdf)  # Arrow path → session-tz TIMESTAMP

    csvp = str(tmp_path_factory.mktemp("csv") / "series.csv")
    pdf.to_csv(csvp, index=False)
    csv = spark.read.csv(
        csvp, header=True, schema="timestamp timestamp, value double"
    )

    assert dict(ntz.dtypes)["timestamp"] == "timestamp_ntz"
    assert dict(ltz.dtypes)["timestamp"] == "timestamp"
    return {"ntz": ntz, "ltz": ltz, "csv": csv}


def _values(df):
    out = df.toPandas()
    out = out.sort_values(list(out.columns)[0]).reset_index(drop=True)
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime"):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
    return out


@pytest.mark.parametrize(
    "kernel",
    [
        lambda df: kernels.resample_mean(df, "5min"),
        lambda df: kernels.interpolate_linear(df),
        lambda df: kernels.interpolate_linear_distributed(df, chunk_seconds=3600.0),
        lambda df: kernels.detect_gaps(df, 450.0),
        lambda df: kernels.locf(df),
        lambda df: kernels.ewma_distributed(df, alpha=0.4, chunk_seconds=3600.0),
    ],
    ids=["resample", "interp", "interp_chunked", "gaps", "locf", "ewma_chunked"],
)
def test_kernel_is_flavor_invariant(flavors, kernel):
    ref = _values(kernel(flavors["ltz"]))
    for name in ("ntz", "csv"):
        got = _values(kernel(flavors[name]))
        assert list(got.columns) == list(ref.columns)
        for c in ref.columns:
            if ref[c].dtype.kind == "f":
                assert np.allclose(
                    got[c], ref[c], rtol=0, atol=1e-12, equal_nan=True
                ), (name, c)
            else:
                assert got[c].equals(ref[c]), (name, c)
