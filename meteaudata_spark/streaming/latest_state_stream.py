"""Streaming CDC latest-state view: the live twin of
``timeseries_queries.ts_latest_state``.

A keyed ``max(struct(ts, event_id, value))`` aggregation — Structured
Streaming keeps one struct of state per (user, type) key and updates
it as events arrive, which IS the materialized "current value" table.
State is O(keys), independent of stream length; ties on ts resolve by
the struct's event_id ordering exactly like the batch operator
(differential-tested).

The demo/test sink runs complete-mode into memory (bounded by key
count); a production deployment sinks update-mode deltas to a
key-value store so only changed keys flow per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_latest_state(stream: DataFrame) -> DataFrame:
    """Latest event per (user_id, event_type), maintained as
    streaming aggregation state."""
    pick = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    ).alias("p")
    return (
        stream.groupBy("user_id", "event_type")
        .agg(pick)
        .select(
            "user_id",
            "event_type",
            F.col("p.event_id").alias("event_id"),
            F.col("p.ts").alias("ts"),
            F.col("p.value").alias("value"),
        )
    )
