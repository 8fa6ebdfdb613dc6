"""Bounded registry for operator-internal caches.

Some operators (minhash/Jaccard dedup) reuse an intermediate DataFrame
across several plan branches; persisting it avoids recomputing a
corpus scan per branch.  But a bare ``df.persist()`` inside an
operator leaks: the returned plan is lazy, so there is no safe point
for the operator itself to unpersist (ADVICE r1).

``cache_intermediate`` registers each persisted intermediate in a
small FIFO registry and evicts (unpersists) the oldest entry beyond a
cap, so a long-lived driver running many operator calls holds a
bounded number of cache entries instead of one per call.  Evicting an
entry that a still-live lazy plan references is safe — Spark silently
recomputes that subplan on next execution.

``release_operator_caches()`` drops everything immediately (used by
benchmarks / tests that need a cold cache).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Optional

from pyspark.sql import DataFrame

_MAX_ACTIVE = 8
_active: "OrderedDict[int, DataFrame]" = OrderedDict()


def cache_intermediate(df: DataFrame, max_active: Optional[int] = None) -> DataFrame:
    """Persist ``df`` and register it for bounded-lifetime cleanup."""
    cap = _MAX_ACTIVE if max_active is None else max_active
    df.persist()
    _active[id(df)] = df
    while len(_active) > cap:
        _, old = _active.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session may already be stopped
    return df


def release_operator_caches() -> int:
    """Unpersist every registered intermediate; returns how many."""
    n = len(_active)
    while _active:
        _, old = _active.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return n
