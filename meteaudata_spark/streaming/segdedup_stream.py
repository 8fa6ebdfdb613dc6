"""Streaming segment-level (C4-style) dedup: the online twin of
``ext/dedup.segment_dedup`` — as documents arrive, each fixed-width
word segment survives only on its FIRST arrival anywhere in the
stream so far; later occurrences (boilerplate, re-crawls, templated
spans) are dropped at ingestion time.

Same sharded-state architecture as the near-dup detector
(``neardup_stream``): segments hash into ≤ ``state_shards``
``applyInPandasWithState`` groups, each holding the set of segment
hashes it has seen (one int64 per distinct segment).  Per micro-batch
the work is one narrow explode + one keyed shuffle; the per-group
Python/state-store overhead amortizes across the hundreds of segments
per shard instead of being paid per segment.

Output is the KEPT (doc_id, seg_idx, segment) rows — the deduplicated
corpus in exploded form; consumers reassemble per doc downstream
(sort by seg_idx, join with spaces), which stays out of the stateful
stage because a document's segments scatter across shards.

Arrival order is the tiebreak: within one micro-batch, rows sort by
(doc_id, seg_idx) inside each shard, so a single-batch replay of a
static corpus reproduces the batch operator's lowest-(doc_id,
seg_idx)-wins keep set exactly (differential-tested).  Across
micro-batches, earlier arrival wins — the streaming semantics.

State is bounded by DISTINCT SEGMENT cardinality (8 bytes + 8 bytes
recency each); ``ttl_minutes`` expires shards idle past the TTL for
bounded windows over unbounded streams (the same trade as the
near-dup detector; an expired segment re-admits its next occurrence).
For churning segment domains where shards are never idle, pass
``evict_after_us`` (+ ``ts_col``) instead: per-segment EVENT-TIME
eviction — a segment whose most recent occurrence falls behind the
shard's max event time by more than the horizon is dropped from the
seen set (the ``dipspike_stream`` policy).  Revival trade-off: an
evicted segment's next occurrence is re-admitted as fresh — exactly
what a watermark would re-admit.  Recency refreshes on EVERY
occurrence (kept or duplicate), so hot boilerplate stays fenced while
one-off segments age out.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_KEPT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("seg_idx", IntegerType()),
        StructField("segment", StringType()),
    ]
)

_SEEN_STATE_SCHEMA = StructType(
    [
        StructField("hashes", ArrayType(LongType())),
        StructField("last_tsu", ArrayType(LongType())),
    ]
)


def _make_seen_update(
    ttl_minutes: int | None, evict_after_us: int | None = None
):
    def update(key, pdfs, state):
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            seen = np.asarray(state.get[0], dtype=np.int64)
            last = np.asarray(state.get[1], dtype=np.int64)
        else:
            seen = np.empty(0, dtype=np.int64)
            last = np.empty(0, dtype=np.int64)
        chunks = [p for p in pdfs if len(p)]
        kept = None
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["doc_id", "seg_idx"], kind="mergesort"
            )
            occ = None
            if evict_after_us is not None:
                # event-time horizon: evict on the PRE-BATCH recency
                # (a segment silent past the horizon expires the
                # moment its shard next runs — refreshing first would
                # let a re-send resurrect its own stale hold), then
                # admit, then refresh survivors' recency with this
                # batch's occurrences (kept or duplicate)
                occ = pdf.groupby("h")["tsu"].max()
                horizon_max = max(
                    int(pdf["tsu"].max()),
                    int(last.max()) if len(last) else -(1 << 62),
                )
                live = last >= horizon_max - int(evict_after_us)
                seen, last = seen[live], last[live]
                hit = np.isin(seen, occ.index.to_numpy())
                if hit.any():
                    last = last.copy()
                    last[hit] = np.maximum(
                        last[hit], occ.loc[seen[hit]].to_numpy()
                    )
            # first-arrival-wins is fully vectorizable: the seen set is
            # FIXED for the whole micro-batch, so within-batch winners
            # are drop_duplicates(keep='first') on the sorted frame and
            # the cross-batch filter is one np.isin — the old per-row
            # Python loop paid ~1-2 µs/segment, the wall at 10M rows
            first = pdf.drop_duplicates(subset=["h"], keep="first")
            fresh = first[~np.isin(first["h"].to_numpy(), seen)]
            if len(fresh):
                seen = np.concatenate([seen, fresh["h"].to_numpy()])
                if evict_after_us is not None:
                    fresh_ts = (
                        occ.loc[fresh["h"].to_numpy()]
                        .to_numpy()
                        .astype(np.int64)
                    )
                else:
                    fresh_ts = np.zeros(len(fresh), dtype=np.int64)
                last = np.concatenate([last, fresh_ts])
                kept = fresh[["doc_id", "seg_idx", "segment"]]
        if len(seen):
            state.update((seen.tolist(), last.tolist()))
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)
        elif state.exists:
            state.remove()
        if kept is not None:
            yield kept

    return update


def stream_segment_dedup(
    stream_df: DataFrame,
    seg_words: int = 8,
    state_shards: int = 4096,
    ttl_minutes: int | None = None,
    evict_after_us: int | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(doc_id, text) stream → kept (doc_id, seg_idx, segment) rows;
    see module docstring for semantics and scale shape.

    ``evict_after_us`` (requires ``ts_col``, mutually exclusive with
    ``ttl_minutes``): per-segment event-time horizon — see module
    docstring.

    CHECKPOINT CONTRACT: the eviction mode is baked into the persisted
    state — ``last_tsu`` holds zeros under ``ttl_minutes`` but
    event-time MICROSECONDS under ``evict_after_us``.  Restarting a
    checkpointed query with the other mode silently misinterprets
    recency (zero/second-scale stamps all fall behind a microsecond
    horizon, wiping the seen set).  Changing the mode requires a fresh
    checkpoint location."""
    if seg_words <= 0:
        raise ValueError("seg_words must be positive")
    if state_shards <= 0:
        raise ValueError("state_shards must be positive")
    if evict_after_us is not None and ttl_minutes is not None:
        raise ValueError(
            "evict_after_us (event time) and ttl_minutes (processing"
            " time) are mutually exclusive"
        )
    if evict_after_us is not None and evict_after_us <= 0:
        raise ValueError("evict_after_us must be positive")
    w = seg_words
    base_cols = [
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.col("text"), " ").alias("__toks"),
    ]
    if evict_after_us is not None:
        base_cols.append(
            (F.col(ts_col).cast("timestamp").cast("double") * 1_000_000)
            .cast("long")
            .alias("tsu")
        )
    extra = ["tsu"] if evict_after_us is not None else []
    segs = (
        stream_df.select(*base_cols)
        .select(
            "doc_id",
            *extra,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(__toks) / {w}.0) as int) - 1), "
                    f"i -> concat_ws(' ', slice(__toks, i * {w} + 1, {w})))"
                )
            ).alias("seg_idx", "segment"),
        )
        .select(
            "doc_id",
            *extra,
            F.col("seg_idx").cast("int").alias("seg_idx"),
            "segment",
            F.xxhash64("segment").alias("h"),
            F.pmod(F.xxhash64("segment"), F.lit(state_shards)).alias("shard"),
        )
    )
    return segs.groupBy("shard").applyInPandasWithState(
        _make_seen_update(ttl_minutes, evict_after_us),
        outputStructType=_KEPT_SCHEMA,
        stateStructType=_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
