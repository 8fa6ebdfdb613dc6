"""Streaming sessionization: the live twin of the batch gap-based
sessionizer (``ext/timeseries_queries.sessionize_events``).

Built entirely on Spark's native ``session_window`` aggregation — the
engine merges events whose timestamps are within ``gap`` of an open
session and finalizes the session once the watermark passes its close,
so state per (user, open session) is O(1) and nothing custom runs in
the hot path.  The semantics line up with the batch rule exactly:
batch starts a new session when the gap to the previous event is
STRICTLY greater than the threshold, and ``session_window`` merges
events at distance ≤ gap — the same boundary (verified by the
differential test in ``tests/test_sessionize_stream.py``).

At scale: sessionization of a 100 TB event stream shuffles once on
``user_id`` (the groupBy key); the watermark bounds both state size
and late-data buffering, and closed sessions stream out append-mode,
so the sink only ever sees finalized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (user, session): start/end bounds, event count, value sum.

    Append-mode: rows emit when the watermark closes the session."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("sess"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
