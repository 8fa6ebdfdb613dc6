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
    if isinstance(index, pd.IntervalIndex):
        # (left, right) struct column — Spark infers
        # struct<left:…,right:…> and orders it lexicographically,
        # which IS interval order; ``closed`` lives in the metadata
        # (reference types.py:109-110,149-150)
        return pd.Series(
            [
                {"left": lo, "right": hi}
                for lo, hi in zip(index.left, index.right)
            ]
        )
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
    if itype == "IntervalIndex":
        # column holds (left, right) struct rows (dicts after
        # toPandas); rebuild with the recorded closed side and cast
        # the bounds back to the recorded subtype, e.g.
        # "interval[float64, left]" → float64
        left = [v["left"] for v in column]
        right = [v["right"] for v in column]
        subtype = None
        if meta.dtype and meta.dtype.startswith("interval["):
            subtype = meta.dtype[len("interval[") : -1].rsplit(",", 1)[0].strip()
        if subtype:
            try:
                left = np.asarray(left).astype(subtype)
                right = np.asarray(right).astype(subtype)
            except (TypeError, ValueError):
                pass
        return pd.IntervalIndex.from_arrays(
            left, right, closed=meta.closed or "right", name=name
        )
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
    if itype == "IntervalIndex":
        sub = "double"
        if meta.dtype and meta.dtype.startswith("interval["):
            pd_sub = meta.dtype[len("interval[") : -1].rsplit(",", 1)[0].strip()
            sub = values_dtype_to_spark(pd_sub)
        return f"struct<left:{sub},right:{sub}>"
    dtype = meta.dtype or ""
    if dtype.startswith("datetime64"):
        return "timestamp"
    return _DTYPE_TO_SPARK.get(dtype, "bigint")
