"""Streaming rollup partials: the ingestion half of incremental
rollup maintenance.

``timeseries_queries.rollup_partials`` defines the mergeable unit
(integer-micro sums + counts per (event_type, 5-min bucket)); this
module emits the SAME partials from a live stream as watermarked
tumbling windows close.  Because partials are exactly associative,
the drained stream output merges with a stored batch base via
``merge_partials`` into the identical table a full recompute would
produce — the lambda-architecture join, differential-tested in
``tests/test_rollup_stream.py``.

State is O(open windows × types); closed windows emit append-mode and
never return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_rollup_partials(
    stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """(event_type, b5, sum_micros, n) from a live event stream —
    bit-compatible with the batch ``rollup_partials``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", "5 minutes").alias("w"))
        .agg(
            F.sum(
                F.round(F.col("value") * 1000000.0).cast("bigint")
            ).alias("sum_micros"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            F.col("w.start").cast("timestamp_ltz").cast("long").alias("b5"),
            "sum_micros",
            "n",
        )
    )
