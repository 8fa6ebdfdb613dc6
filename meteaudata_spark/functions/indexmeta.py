"""Extraction / reconstruction of pandas index metadata.

The Spark data plane stores the index as an explicit column; these
helpers capture enough metadata from an incoming pandas index to
rebuild the exact pandas index on export (reference semantics:
types.py:95-173, tested per index type in
reference tests/test_index_metadata.py:94-211).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from meteaudata_spark.metadata import IndexMetadata


def extract_index_metadata(index: pd.Index) -> IndexMetadata:
    """Capture type + type-specific attributes of a pandas index."""
    meta = IndexMetadata(
        type=type(index).__name__,
        name=str(index.name) if index.name is not None else None,
        dtype=str(index.dtype),
    )
    if isinstance(index, pd.DatetimeIndex):
        meta.frequency = index.freqstr if index.freq is not None else None
        meta.time_zone = str(index.tz) if index.tz is not None else None
    elif isinstance(index, pd.PeriodIndex):
        meta.frequency = index.freqstr
    elif isinstance(index, pd.IntervalIndex):
        meta.closed = index.closed
    elif isinstance(index, pd.CategoricalIndex):
        meta.categories = [str(c) for c in index.categories]
        meta.ordered = bool(index.ordered)
    elif isinstance(index, pd.RangeIndex):
        meta.start = int(index.start)
        meta.end = int(index.stop)
        meta.step = int(index.step)
    return meta


def index_to_column(index: pd.Index) -> pd.Series:
    """Flatten a pandas index to a plain column for the Spark plane.

    Datetime stays datetime (tz-naive, UTC-normalized); Period becomes
    period-start timestamp; Categorical becomes string; Range/Int64/
    Float64 become their numeric values.
    """
    if isinstance(index, pd.DatetimeIndex):
        values = index.tz_convert("UTC").tz_localize(None) if index.tz is not None else index
        return pd.Series(values)
    if isinstance(index, pd.PeriodIndex):
        return pd.Series(index.to_timestamp(how="start"))
    if isinstance(index, pd.CategoricalIndex):
        return pd.Series(index.astype(str))
    return pd.Series(np.asarray(index))


def reconstruct_index(column: pd.Series, meta: IndexMetadata) -> pd.Index:
    """Rebuild the original pandas index from the stored column + metadata."""
    name = meta.name
    itype = meta.type
    if itype == "DatetimeIndex":
        idx = pd.DatetimeIndex(pd.to_datetime(column.values), name=name)
        if meta.time_zone is not None:
            idx = idx.tz_localize("UTC").tz_convert(meta.time_zone)
        if meta.frequency is not None:
            try:
                idx.freq = pd.tseries.frequencies.to_offset(meta.frequency)
            except ValueError:
                pass  # irregular after transforms; frequency is advisory
        return idx
    if itype == "PeriodIndex":
        dt = pd.DatetimeIndex(pd.to_datetime(column.values))
        return pd.PeriodIndex(dt, freq=meta.frequency, name=name)
    if itype == "CategoricalIndex":
        return pd.CategoricalIndex(
            column.astype(str).values,
            categories=meta.categories,
            ordered=meta.ordered,
            name=name,
        )
    if itype == "RangeIndex":
        start = meta.start if meta.start is not None else 0
        step = meta.step if meta.step is not None else 1
        stop = meta.end if meta.end is not None else start + step * len(column)
        return pd.RangeIndex(start=start, stop=stop, step=step, name=name)
    if itype == "TimedeltaIndex":
        return pd.TimedeltaIndex(column.values, name=name)
    # Int64Index / Float64Index / generic Index
    dtype = meta.dtype or None
    values: Any = column.values
    if dtype is not None:
        try:
            values = np.asarray(values).astype(dtype)
        except (TypeError, ValueError):
            pass
    return pd.Index(values, name=name)


_DTYPE_TO_SPARK = {
    "float64": "double",
    "float32": "float",
    "int64": "bigint",
    "int32": "int",
    "bool": "boolean",
    "object": "string",
    "str": "string",
    "string": "string",
}


def values_dtype_to_spark(values_dtype: str) -> str:
    """Map a recorded pandas dtype string to a Spark SQL type name."""
    if values_dtype.startswith("datetime64"):
        return "timestamp"
    return _DTYPE_TO_SPARK.get(values_dtype, "string")


def index_meta_to_spark(meta: IndexMetadata) -> str:
    """Spark SQL type of the index *column* implied by index metadata.

    Mirrors ``index_to_column``: Datetime/Period → timestamp,
    Categorical → string, Timedelta → day-time interval, everything
    else follows the recorded index dtype. Used to declare the schema
    of an empty series so it stays union/join-compatible with
    non-empty series of the same index type (reference reconstructs
    per-type the same way, types.py:125-173).
    """
    itype = meta.type or ""
    if itype in ("DatetimeIndex", "PeriodIndex"):
        return "timestamp"
    if itype == "CategoricalIndex":
        return "string"
    if itype == "TimedeltaIndex":
        return "interval day to second"
    dtype = meta.dtype or ""
    if dtype.startswith("datetime64"):
        return "timestamp"
    return _DTYPE_TO_SPARK.get(dtype, "bigint")
