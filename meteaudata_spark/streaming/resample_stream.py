"""Structured Streaming analogs of the batch time-series operators
(SURVEY §2.8 — absent in the reference; the natural Spark extension).

The batch resample kernel (``operators/kernels.py:resample_mean``) maps
onto a watermarked tumbling-window aggregation; late data is handled
by the watermark instead of the batch spine join (a stream has no
"final" spine — emitted windows ARE the spine, and empty windows
simply never materialize).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteaudata_spark.functions.freq import to_spark_interval


def stream_resample_mean(
    stream_df: DataFrame,
    freq: str,
    watermark: str = "10 minutes",
    ts_col: str = "timestamp",
    val_col: str = "value",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Streaming tumbling-window mean: the streaming analog of the
    reference's resample operator.

    Returns an unbounded DataFrame suitable for ``writeStream`` in
    append mode (watermark closes windows).  NaNs are normalized to
    null so the mean skips them, matching the batch/pandas semantics.
    """
    interval = to_spark_interval(freq)
    clean = (
        F.when(F.isnan(F.col(val_col)), F.lit(None)).otherwise(F.col(val_col))
        if dict(stream_df.dtypes)[val_col] in ("double", "float")
        else F.col(val_col)
    )
    grouped = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            *list(partition_cols),
            F.window(F.col(ts_col), interval).alias("__w"),
        )
        .agg(F.avg(clean).alias(val_col))
    )
    return grouped.select(
        *list(partition_cols),
        F.col("__w.start").alias(ts_col),
        F.col(val_col),
    )


def stream_sessionize(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "timestamp",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows with a dynamic gap — the streaming analog of the
    batch sessionize query (ext/timeseries_queries.py)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col),
            F.session_window(F.col(ts_col), gap).alias("__s"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n_events",
        )
    )
