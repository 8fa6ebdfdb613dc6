"""Multivariate (Dataset-level) transform functions.

Reference parity: ``average_signals``
(reference processing_steps/multivariate/average.py:15-82).
"""

from __future__ import annotations

import datetime
from typing import Any, Optional

from meteaudata_spark.metadata import (
    DataProvenance,
    FunctionInfo,
    ProcessingStep,
    ProcessingType,
)
from meteaudata_spark.operators.kernels import aligned_agg
from meteaudata_spark.signal import Signal
from meteaudata_spark.timeseries import TimeSeries


def _units_guard(input_signals: list[Signal]) -> str:
    units_set = {sig.units for sig in input_signals}
    if len(units_set) > 1:
        raise ValueError(
            f"Signals have different units: {units_set}. "
            "Please provide signals with the same units."
        )
    return units_set.pop()


def _aligned_signal_agg(
    input_signals: list[Signal],
    input_series_names: list[str],
    agg: str,
    signal_name: str,
    step: ProcessingStep,
    provenance: Optional[DataProvenance],
) -> list[Signal]:
    units = _units_guard(input_signals)
    series: list[TimeSeries] = []
    for sig, full_name in zip(input_signals, input_series_names):
        ts = sig.time_series[full_name]
        if ts.index_metadata.type not in ("DatetimeIndex", "TimedeltaIndex"):
            raise IndexError(
                f"Series {full_name} has index type {ts.index_metadata.type}. "
                "Please provide either pd.DatetimeIndex or pd.TimedeltaIndex"
            )
        series.append(ts)

    # Outer alignment + row-wise agg in long layout: union all series and
    # group by timestamp (one shuffle; absent points contribute no row,
    # null-skipping matches pandas mean(axis=1) — average.py:61-62).
    long_df = None
    for ts in series:
        part = ts.df
        long_df = part if long_df is None else long_df.unionByName(part)
    out_df = aligned_agg(long_df, agg=agg)

    out_ts = TimeSeries(
        df=out_df,
        index_metadata=series[0].index_metadata.model_copy(deep=True),
        values_dtype="float64",
        name=f"{signal_name}_{step.suffix}",
        )
    out_ts.processing_steps = [step]
    new_provenance = provenance or input_signals[0].provenance
    return [
        Signal(
            input_data=out_ts,
            name=signal_name,
            units=units,
            provenance=new_provenance,
        )
    ]


def average_signals(
    input_signals: list[Signal],
    input_series_names: list[str],
    final_provenance: Optional[DataProvenance] = None,
    *args: Any,
    **kwargs: Any,
) -> list[Signal]:
    """Arithmetic mean across aligned series → new Signal ``AVERAGE``."""
    step = ProcessingStep(
        type=ProcessingType.DIMENSIONALITY_REDUCTION,
        description="The artithmetic mean of input time series.",
        run_datetime=datetime.datetime.now(),
        requires_calibration=False,
        function_info=FunctionInfo(
            name="Signal Averaging",
            version="0.1",
            author="meteaudata-spark",
            reference="www.github.com/modelEAU/metEAUdata",
        ).capture_source(average_signals),
        parameters=None,
        input_series_names=list(input_series_names),
        suffix="RAW",
    )
    return _aligned_signal_agg(
        input_signals, input_series_names, "avg", "AVERAGE", step, final_provenance
    )


def sum_signals(
    input_signals: list[Signal],
    input_series_names: list[str],
    final_provenance: Optional[DataProvenance] = None,
    *args: Any,
    **kwargs: Any,
) -> list[Signal]:
    """Row-wise sum across aligned series (the README's documented
    dataset-UDF pattern — reference README.md:339)."""
    step = ProcessingStep(
        type=ProcessingType.DIMENSIONALITY_REDUCTION,
        description="The sum of input time series.",
        run_datetime=datetime.datetime.now(),
        requires_calibration=False,
        function_info=FunctionInfo(
            name="Signal Sum",
            version="0.1",
            author="meteaudata-spark",
            reference="www.github.com/modelEAU/metEAUdata",
        ).capture_source(sum_signals),
        parameters=None,
        input_series_names=list(input_series_names),
        suffix="RAW",
    )
    return _aligned_signal_agg(
        input_signals, input_series_names, "sum", "SUM", step, final_provenance
    )
