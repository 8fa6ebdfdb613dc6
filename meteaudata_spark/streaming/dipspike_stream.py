"""Streaming dip/spike detection: the CEP-style live twin of the batch
V-shape detector (``ext/timeseries_queries.dip_spike``).

A completed V needs the NEXT point, so detection is emit-on-successor:
``applyInPandasWithState`` keyed on (user_id, event_type) keeps only
the last TWO points per series (prev-prev, prev); each arriving point
closes the triple around ``prev`` and emits its classification.  State
is exactly two (ts, event_id, value-micros) tuples per live series —
O(1) per key, the smallest state any 3-point pattern matcher can hold.

Semantics match the batch operator bit-for-bit: values micro-quantize
to BIGINT on entry and the 25% fences compare via integer
cross-multiplication, so the streamed flags equal the batch interior
classification (differential test in ``tests/test_dipspike_stream.py``).

Ordering contract: per-key event-time order at ingestion (same as
every per-key recurrence — the sessionize/EWMA twins share it).  Rows
inside a micro-batch are sorted by (ts, event_id) before applying;
cross-batch reordering is the source's responsibility (Kafka per-key
partitions, file order for replay).

At scale: one shuffle on the (user, type) series key per micro-batch;
state stores two tuples per live series regardless of history length.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_FENCE_BP = 2500

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("vm", LongType()),
        StructField("is_dip", BooleanType()),
        StructField("is_spike", BooleanType()),
    ]
)

# prev-prev and prev point: (event_id, ts_micros, value_micros) each;
# a -1 event_id marks "absent"
_STATE_SCHEMA = StructType(
    [
        StructField("id0", LongType()),
        StructField("ts0", LongType()),
        StructField("vm0", LongType()),
        StructField("id1", LongType()),
        StructField("ts1", LongType()),
        StructField("vm1", LongType()),
    ]
)


def _classify(pv: int, cur: int, nv: int) -> Tuple[bool, bool]:
    lo = 10000 - _FENCE_BP
    hi = 10000 + _FENCE_BP
    is_dip = cur * 10000 < pv * lo and cur * 10000 < nv * lo
    is_spike = cur * 10000 > pv * hi and cur * 10000 > nv * hi
    return is_dip, is_spike


def _update(
    key: Tuple[int, str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        id0, ts0, vm0, id1, ts1, vm1 = state.get
    else:
        id0 = id1 = -1
        ts0 = ts1 = vm0 = vm1 = 0
    rows = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
    for r in batch.itertuples(index=False):
        cur_id = int(r.event_id)
        cur_ts = pd.Timestamp(r.ts).value // 1000
        cur_vm = int(round(float(r.value) * 1000000.0))
        if id0 >= 0 and id1 >= 0:
            is_dip, is_spike = _classify(vm0, vm1, cur_vm)
            rows.append((key[0], key[1], id1, ts1, vm1, is_dip, is_spike))
        id0, ts0, vm0 = id1, ts1, vm1
        id1, ts1, vm1 = cur_id, cur_ts, cur_vm
    state.update((id0, ts0, vm0, id1, ts1, vm1))
    out = pd.DataFrame(
        rows,
        columns=[
            "user_id", "event_type", "event_id", "ts", "vm",
            "is_dip", "is_spike",
        ],
    )
    if len(out):
        out["ts"] = pd.to_datetime(out["ts"], unit="us")
    yield out


def stream_dip_spike(stream: DataFrame) -> DataFrame:
    """Per-(user, type) streamed triple classification (append mode):
    one output row per INTERIOR point, emitted when its successor
    arrives."""
    keyed = stream.select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    return keyed.groupBy("user_id", "event_type").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["stream_dip_spike"]
