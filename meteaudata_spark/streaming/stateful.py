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
