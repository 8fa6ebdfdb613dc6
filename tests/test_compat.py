"""Pandas-compat adapter: the reference's own transform functions run
unchanged against Spark-backed Signals."""

import datetime

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.metadata import (
    FunctionInfo,
    Parameters,
    ProcessingStep,
    ProcessingType,
)
from meteaudata_spark.operators.pandas_compat import (
    apply_pandas_kernel_grouped,
    wrap_pandas_transform,
)
from meteaudata_spark.signal import Signal


def legacy_double(input_series, *args, **kwargs):
    """A reference-protocol pandas transform (README.md:262-272 style)."""
    step = ProcessingStep(
        type=ProcessingType.TRANSFORMATION,
        description="doubles the values",
        run_datetime=datetime.datetime.now(),
        requires_calibration=False,
        function_info=FunctionInfo(name="double", version="1"),
        parameters=Parameters(),
        suffix="DOUBLED",
        input_series_names=[str(s.name) for s in input_series],
    )
    out = []
    for col in input_series:
        col = col.copy()
        signal, _ = str(col.name).split("_")
        doubled = col * 2
        doubled.name = f"{signal}_{step.suffix}"
        out.append((doubled, [step]))
    return out


def test_wrapped_pandas_transform(spark, sample_series, provenance):
    sig = Signal(
        input_data=sample_series, name="X", units="mg/l",
        provenance=provenance, spark=spark,
    )
    sig.process(["X#1_RAW#1"], wrap_pandas_transform(legacy_double))
    assert "X#1_DOUBLED#1" in sig.all_time_series
    got = sig.time_series["X#1_DOUBLED#1"].to_pandas()
    assert np.allclose(got.values, sample_series.values * 2)
    # lineage flows exactly as with native operators
    steps = sig.time_series["X#1_DOUBLED#1"].processing_steps
    assert steps[-1].suffix == "DOUBLED"
    assert steps[-1].input_series_names == ["X#1_RAW#1"]


def test_grouped_pandas_kernel(spark):
    pdf = pd.DataFrame(
        {
            "series_name": ["a"] * 10 + ["b"] * 10,
            "timestamp": list(pd.date_range("2020-01-01", freq="1min", periods=10)) * 2,
            "value": list(range(10)) + list(range(100, 110)),
        }
    )
    df = spark.createDataFrame(pdf)

    def zscore(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["value"] = (g["value"] - g["value"].mean()) / g["value"].std()
        return g

    out = apply_pandas_kernel_grouped(
        df, zscore, "series_name string, timestamp timestamp, value double"
    ).toPandas()
    for key, grp in out.groupby("series_name"):
        assert abs(grp["value"].mean()) < 1e-9
