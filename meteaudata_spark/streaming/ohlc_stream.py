"""Streaming OHLC candle builder: the live half of
``ext/timeseries_queries.ts_ohlc_daily``.

Open/close are min/max over a (total-order-key, value) STRUCT — the
same zero-padded (epoch-micros, event_id) key the batch operator
folds with ``min_by``/``max_by`` — so every aggregate here is a plain
JVM streaming aggregation (no Python state, no custom operator): the
state store holds one struct row per (event_type, day) candle and
merges new rows with min/max/count, which is exactly the mergeable
shape that lets a drained stream equal the batch rollup bit for bit
(differential-tested in ``tests/test_ohlc_stream.py``).

With a watermark the candles emit append-mode once their day closes;
without one (update mode) each micro-batch re-emits the candles it
touched — the live-dashboard shape.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_ohlc_daily(
    stream: DataFrame, watermark: Optional[str] = None
) -> DataFrame:
    """(event_type, day, open, high, low, close, volume) from a live
    event stream — bit-compatible with the batch ``ts_ohlc_daily``.

    ``watermark`` (e.g. ``"1 day"``) switches to append-mode emission
    of closed candles and bounds state by the watermark horizon; the
    default (update mode) keeps one state row per open candle."""
    # watermarks (and unix_micros) need TIMESTAMP, not the parquet
    # TIMESTAMP_NTZ — the session TZ is pinned UTC, so the cast is the
    # identity epoch
    src = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    # the candle grid is an event-time tumbling window (equal to the
    # batch date_trunc('day') grid — 1-day windows are epoch-aligned);
    # window() is what lets append mode tie emission to the watermark
    keyed = src.select(
        "event_type",
        F.col("ts"),
        F.struct(key.alias("k"), F.col("value").alias("v")).alias("kv"),
        "value",
    )
    return (
        keyed.groupBy("event_type", F.window("ts", "1 day").alias("__w"))
        .agg(
            F.min("kv").alias("__first"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("kv").alias("__last"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
        )
        .select(
            "event_type",
            F.col("__w.start").alias("day"),
            F.col("__first.v").alias("open"),
            "high",
            "low",
            F.col("__last.v").alias("close"),
            "volume",
        )
    )
