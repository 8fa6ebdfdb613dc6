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

# Sized ABOVE the standing working set (6 prewarmed shared relations +
# minhash signatures + the odd per-query intermediate): at 8, the
# round-10 bench measured the FIFO evicting the prewarmed relations'
# persists mid-run — memoized queries then silently recomputed
# (doc_minhash_lsh_pairs 0.08 s → 1.31 s).  Round 11 re-measured the
# same failure at 24 (the incremental-ledger rows add ~7 entries per
# bench pass and the rotation runs them before the dedup readers:
# memo-read rows regressed 4-15×), so the cap was raised to 48 AND the
# warm relations are PINNED outside the FIFO (``pin_caches``).  Round
# 14 raised it again to 96: the gate grew to 231 rows (each pass
# registers well over 48 entries, so every shared core was evicted and
# re-healed once per pass — non-uniform multi-second penalties landed
# on whichever rows hit the re-heal, e.g. ts_forecast_eval 0.79→5.7 s
# while neighbors moved ~1.5×).  Entries are driver-side handles; the
# data lives in executor storage memory and spills to disk under
# pressure, so the cap bounds bookkeeping, not heap.
_MAX_ACTIVE = 96
_active: "OrderedDict[int, DataFrame]" = OrderedDict()
_pinned: "OrderedDict[int, DataFrame]" = OrderedDict()
_pin_mode = False

# Above the count of DISTINCT memo keys a full 231-row gate pass
# touches (~26 after the r14 batch-3 shared rankers); overflow would
# silently evict + rebuild prewarmed cores mid-pass.
_MEMO_CAP = 64
_memo: "OrderedDict[tuple, DataFrame]" = OrderedDict()


def memo_relation(spark, key: tuple, build) -> DataFrame:
    """Per-(session, key) memo of a shared intermediate relation, so
    COMPOSITIONS reuse their upstream instead of recomputing it
    (VERDICT r8 #3: ``doc_dedup_keep_best`` re-ran pair mining +
    clustering + scoring on every call).

    The built DataFrame is persisted via ``cache_intermediate`` (FIFO-
    bounded storage); the memo itself is FIFO-bounded too.  Keys
    include the Spark application id so a memo never leaks across
    sessions.

    SELF-HEAL (VERDICT r11 nit / r12 watch item — the
    ``doc_dedup_agreement`` 4-15× memo-read drift): a memo HIT whose
    persist was FIFO-evicted by later ``cache_intermediate`` churn
    used to recompute its corpus mining on EVERY downstream execution
    — silently, since the lazy plan stays valid.  A hit is now
    re-registered (re-persisted) when its storage level has been
    dropped, so an evicted relation recomputes at most once and is
    cached again.  Pinned by
    tests/test_opcache_memo.py::test_memo_hit_heals_evicted_persist."""
    k = (spark.sparkContext.applicationId,) + tuple(key)
    df = _memo.get(k)
    if df is None:
        df = cache_intermediate(build())
        _memo[k] = df
        while len(_memo) > _MEMO_CAP:
            _memo.popitem(last=False)
    else:
        sl = df.storageLevel
        if not (sl.useMemory or sl.useDisk or sl.useOffHeap):
            cache_intermediate(df)  # evicted by FIFO churn: re-persist
    return df


def cache_intermediate(df: DataFrame, max_active: Optional[int] = None) -> DataFrame:
    """Persist ``df`` and register it for bounded-lifetime cleanup.

    Inside a ``pin_caches()`` block the entry is registered PINNED —
    exempt from the FIFO, released only by
    ``release_operator_caches()`` — for standing working-set relations
    (the bench prewarm) that per-query churn must not evict."""
    df.persist()
    if _pin_mode:
        _pinned[id(df)] = df
        return df
    cap = _MAX_ACTIVE if max_active is None else max_active
    _active[id(df)] = df
    while len(_active) > cap:
        _, old = _active.popitem(last=False)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session may already be stopped
    return df


class pin_caches:
    """Context manager: every ``cache_intermediate`` within is pinned
    (see above).  Not re-entrant-safe across threads — the bench and
    warm path are single-threaded driver code."""

    def __enter__(self):
        global _pin_mode
        self._prev = _pin_mode
        _pin_mode = True
        return self

    def __exit__(self, *exc):
        global _pin_mode
        _pin_mode = self._prev
        return False


def release_operator_caches() -> int:
    """Unpersist every registered intermediate (pinned included);
    returns how many."""
    _memo.clear()
    n = len(_active) + len(_pinned)
    for reg in (_active, _pinned):
        while reg:
            _, old = reg.popitem(last=False)
            try:
                old.unpersist(blocking=False)
            except Exception:
                pass
    return n
