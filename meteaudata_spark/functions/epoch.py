"""NTZ-safe epoch-seconds conversion.

Parquet written from tz-naive pandas timestamps carries
``isAdjustedToUTC=false``, which current Spark surfaces as
``TIMESTAMP_NTZ`` — and ``CAST(ntz AS DOUBLE)`` is an
AnalysisException (``DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION``),
unlike the session-tz ``TIMESTAMP`` (LTZ) where the double cast gives
microsecond-exact epoch seconds.

Every kernel that does timestamp arithmetic goes through
``epoch_seconds`` below: the NTZ→LTZ cast interprets the wall clock in
the session timezone, so under the engine's pinned-UTC session it is
the identity on the stored value, and for *differences* (deltas,
bucket offsets from a day-truncated origin) the session-zone offset
cancels under any fixed-offset zone.  ``seconds_to_ts`` converts back,
restoring the input column's timestamp flavor so NTZ-in → NTZ-out
(keeps result schemas stable no matter how the input was read).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column) -> Column:
    """Epoch seconds (microsecond-exact double) for LTZ *and* NTZ
    timestamps.  LTZ: the extra cast is a no-op.  NTZ: wall clock is
    interpreted in the session timezone (pin it to UTC for absolute
    epochs; differences are zone-independent)."""
    return col.cast("timestamp_ltz").cast("double")


def seconds_to_ts(sec: Column, ts_dtype: str = "timestamp") -> Column:
    """Inverse of :func:`epoch_seconds`: epoch seconds back to a
    timestamp of the given Spark dtype string (``timestamp`` |
    ``timestamp_ntz``), so kernels preserve their input's flavor."""
    t = F.timestamp_seconds(sec)
    return t if ts_dtype == "timestamp" else t.cast(ts_dtype)
