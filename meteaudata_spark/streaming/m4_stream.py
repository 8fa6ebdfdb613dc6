"""Streaming M4 downsampling: the live-dashboard feed.

The batch side (``ext/timeseries_queries.ts_m4_downsample``) reduces a
stored series to first/last/min/max per pixel bucket.  The streaming
twin keeps a live chart's tail fresh: a watermarked tumbling-window
aggregation emits the same four points per (key, window) as windows
close — all built-in min/max aggregates over (epoch, value) structs,
so state per open window is O(1) and the operator is pure Structured
Streaming (no custom state, no Python in the hot path).

Emitted rows are append-mode finalized windows; a dashboard unions
them with the batch M4 of the historical store for a seamless
past+present line.  The struct orderings match the batch operator
exactly (min/max ties resolve by earliest/latest timestamp), verified
by the differential test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteaudata_spark.functions.epoch import epoch_seconds


def stream_m4(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    partition_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, tumbling window): first/last/min/max points plus the
    row count — the M4 quadruple for that window of the live series."""
    e_us = (epoch_seconds(F.col(ts_col)) * 1000000).cast("bigint")
    base = stream.withWatermark(ts_col, watermark).select(
        partition_col,
        F.col(ts_col),
        e_us.alias("__e"),
        F.col(value_col).alias("__v"),
    )
    agg = base.groupBy(
        partition_col, F.window(ts_col, window).alias("win")
    ).agg(
        F.min(F.struct("__e", "__v")).alias("first_pt"),
        F.max(F.struct("__e", "__v")).alias("last_pt"),
        F.min(F.struct("__v", "__e")).alias("min_pt"),
        F.max(F.struct("__v", "__e")).alias("max_pt"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return agg.select(
        partition_col,
        F.col("win.start").alias("window_start"),
        "n_rows",
        F.col("first_pt.__e").alias("first_e"),
        F.col("first_pt.__v").alias("first_v"),
        F.col("last_pt.__e").alias("last_e"),
        F.col("last_pt.__v").alias("last_v"),
        F.col("min_pt.__e").alias("min_e"),
        F.col("min_pt.__v").alias("min_v"),
        F.col("max_pt.__e").alias("max_e"),
        F.col("max_pt.__v").alias("max_v"),
    )
