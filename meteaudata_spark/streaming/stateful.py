"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.8 — the extension point for operators Spark's built-in
windowed aggs can't express).

``stream_running_stats``: per-key exponentially-less-naive running
statistics (count / mean / M2 via Welford) carried across micro-
batches in GroupState — the streaming analog of a cumulative
per-series statistics operator, and the template for stateful
gap-filling or online anomaly scoring."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_total", LongType()),
        StructField("mean", DoubleType()),
        StructField("variance", DoubleType()),
        StructField("batch_n", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _update_running_stats(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    batch_n = 0
    for pdf in pdfs:
        for v in pdf["value"].dropna():
            n += 1
            batch_n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
    state.update((n, mean, m2))
    variance = m2 / (n - 1) if n > 1 else 0.0
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_total": [n],
            "mean": [mean],
            "variance": [variance],
            "batch_n": [batch_n],
        }
    )


def stream_running_stats(
    stream_df: DataFrame, key_col: str = "event_type", val_col: str = "value"
) -> DataFrame:
    """Per-key Welford running stats carried across micro-batches.

    Output (update mode): one row per key per batch with cumulative
    count/mean/variance.  State is O(1) per key — three doubles — so
    key cardinality, not stream length, bounds memory."""
    from pyspark.sql import functions as F

    renamed = stream_df.select(
        F.col(key_col).alias("key"), F.col(val_col).alias("value")
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _update_running_stats,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)

_EWMA_STATE_SCHEMA = StructType(
    [StructField("last", DoubleType()), StructField("seeded", LongType())]
)


def stream_ewma_state(
    stream_df: DataFrame,
    alpha: float = 0.5,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-key EWMA carried across micro-batches on the EXECUTABLE
    stateful API (``applyInPandasWithState``) — the runtime
    counterpart of ``transform_state.stream_ewma``, whose
    ``transformWithState`` protocol needs protobuf this environment
    lacks.  Identical recurrence to ``kernels.ewma``
    (e = (1−α)·e + α·x, seed = first value), one double of state per
    key; events sort by ``(ts_col, value)`` inside each micro-batch
    (the group's chunks are CONCATENATED first — per-chunk sorting
    would be order-unstable, the pitfall the semantic dedup stream
    documents; the value tiebreak makes same-timestamp events
    deterministic where a ts-only sort would keep shuffle-dependent
    arrival order).  Emits every event with its smoothed value
    (append)."""

    def update(key, pdfs, state):
        if state.exists:
            last, seeded = state.get
        else:
            last, seeded = 0.0, 0
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "value"], kind="mergesort"
            )
            out_ts, out_v, out_e = [], [], []
            for ts, v in zip(pdf["ts"], pdf["value"]):
                v = float(v)
                if not seeded:
                    last, seeded = v, 1
                else:
                    last = (1 - alpha) * last + alpha * v
                out_ts.append(int(ts))
                out_v.append(v)
                out_e.append(last)
            state.update((last, seeded))
            yield pd.DataFrame(
                {
                    "key": key[0],
                    "ts": out_ts,
                    "value": out_v,
                    "ewma": out_e,
                }
            )
        else:
            state.update((last, seeded))

    from pyspark.sql import functions as F

    renamed = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(val_col).cast("double").alias("value"),
    )
    return renamed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_HOLT_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_next", DoubleType()),
    ]
)

_HOLT_STATE_SCHEMA = StructType(
    [
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("seeded", LongType()),
    ]
)


def stream_holt_state(
    stream_df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Per-key Holt double-exponential smoothing carried across
    micro-batches — the ONLINE FORECASTER: every arriving event emits
    its smoothed level, trend, and one-step forecast (level + trend),
    with two doubles of state per key.  Identical recurrence to
    ``kernels.holt`` (l₁ = x₁, b₁ = 0), same chunk-concat order
    stability as ``stream_ewma_state``."""

    def update(key, pdfs, state):
        if state.exists:
            level, trend, seeded = state.get
        else:
            level, trend, seeded = 0.0, 0.0, 0
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "value"], kind="mergesort"
            )
            rows = {k: [] for k in ("ts", "value", "level", "trend")}
            for ts, v in zip(pdf["ts"], pdf["value"]):
                v = float(v)
                if not seeded:
                    level, trend, seeded = v, 0.0, 1
                else:
                    prev_l = level
                    level = alpha * v + (1 - alpha) * (level + trend)
                    trend = beta * (level - prev_l) + (1 - beta) * trend
                rows["ts"].append(int(ts))
                rows["value"].append(v)
                rows["level"].append(level)
                rows["trend"].append(trend)
            state.update((level, trend, seeded))
            out = pd.DataFrame(rows)
            out.insert(0, "key", key[0])
            out["forecast_next"] = out["level"] + out["trend"]
            yield out
        else:
            state.update((level, trend, seeded))

    from pyspark.sql import functions as F

    renamed = stream_df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(val_col).cast("double").alias("value"),
    )
    return renamed.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_HOLT_OUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
