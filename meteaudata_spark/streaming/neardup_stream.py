"""Streaming near-duplicate detection: MinHash band buckets + stateful
first-seen memory (``applyInPandasWithState``).

The batch dedup ladder (``ext/dedup.py``) mines near-dup PAIRS with a
band self-join — a batch-only shape.  The streaming analog answers the
online question instead: *is this incoming document a near-duplicate
of anything seen so far?*  Per micro-batch:

1. a Pandas UDF computes each document's MinHash band sub-signatures
   with the SAME deterministic shingle/coefficient math as the batch
   pipeline (word-3-gram → 60-bit md5 → per-j affine mod 2³¹−1), so a
   document collides with its batch-computed self;
2. rows explode to (band, bucket) keys and hash to one of
   ``state_shards`` state groups;
3. ``applyInPandasWithState`` keyed on the SHARD keeps a compact
   bucket→(first_seen doc_id, count, last_seen) map per shard and
   emits a row for every LATER document that lands in a non-empty
   bucket.

Sharding is the throughput lever: one state group PER BUCKET pays the
per-group Python-invocation + state-store round trip for every
distinct bucket in every micro-batch (measured ~65 µs/group — 26 s of
a 32 s batch at 100k docs/400k buckets); a few thousand shard groups
amortize that overhead across ~hundreds of buckets each while the
per-row work stays the same dict update.

Emitted rows are near-dup CANDIDATES (recall governed by bands ×
rows-per-band exactly as in batch LSH; no false-negative exact dups).
A downstream exact-verify join against a document store mirrors the
batch verify stage and stays out of scope here.

State is bounded by DISTINCT BUCKET cardinality, not stream length
(sharding only changes how buckets pack into groups); production
deployments should pass ``ttl_minutes`` so idle buckets expire —
entries are pruned inside each shard on every invocation and fully
idle shards drop via the processing-time timeout.  For replayed or
event-timed streams where wall-clock TTL is meaningless, pass
``evict_after_us`` (+ ``ts_col``; mutually exclusive with
``ttl_minutes``) instead: per-bucket EVENT-TIME eviction — a bucket
whose most recent occurrence falls behind the shard's max event time
by more than the horizon is dropped (the ``dipspike_stream`` policy).
Revival trade-off: a later collision in an evicted bucket re-seeds it
as first-seen, so the pre-gap occupant is never reported — exactly
the pair a watermark would have discarded.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MERSENNE = (1 << 31) - 1  # same modulus as ext/dedup.py

_CANDIDATE_SCHEMA = StructType(
    [
        StructField("band", LongType()),
        StructField("bucket", StringType()),
        StructField("doc_id", LongType()),
        StructField("first_doc_id", LongType()),
        StructField("n_seen_in_bucket", LongType()),
    ]
)

_BUCKET_STATE_SCHEMA = StructType(
    [StructField("first_doc", LongType()), StructField("n_seen", LongType())]
)

# sharded layout: parallel arrays, one entry per live bucket in the shard
_SHARD_STATE_SCHEMA = StructType(
    [
        StructField("buckets", ArrayType(StringType())),
        StructField("first_docs", ArrayType(LongType())),
        StructField("n_seens", ArrayType(LongType())),
        StructField("last_seens", ArrayType(LongType())),
    ]
)


def _band_signatures(
    text: str, num_hashes: int, bands: int, n: int
) -> list[str]:
    """Per-doc band sub-signatures, bit-identical to the batch
    pipeline's (``ext/dedup.py`` ``minhash_lsh_pairs``).  Reference
    implementation — the streaming hot path uses the vectorized
    ``_band_signatures_batch`` (equality pinned by test)."""
    words = text.split(" ")
    shingles = {
        " ".join(words[i : i + n]) for i in range(max(0, len(words) - n + 1))
    }
    hs = [
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MERSENNE
        for s in shingles
    ] or [0]
    sig = [
        min(((2 * j + 1) * h + 7919 * (j + 1)) % _MERSENNE for h in hs)
        for j in range(num_hashes)
    ]
    rows_per_band = num_hashes // bands
    return [
        "-".join(
            str(sig[band * rows_per_band + r]) for r in range(rows_per_band)
        )
        for band in range(bands)
    ]


def _band_signatures_batch(
    texts: list[str], num_hashes: int, bands: int, n: int
) -> list[list[str]]:
    """Vectorized twin of ``_band_signatures`` over a whole Arrow
    batch: shingle + md5 stay per-string (md5 has no numpy kernel and
    the batch pipeline's exact bits are the contract), but the
    num_hashes × n_shingles affine/min recurrence — the dominant cost
    of the per-doc loop — becomes one (num_hashes, total_shingles)
    matrix with a segment-min (``np.minimum.reduceat``) per doc.
    Bit-identical output, ~10× the per-doc throughput."""
    import numpy as np

    all_h: list[int] = []
    offsets = [0]
    for t in texts:
        words = (t or "").split(" ")
        shingles = {
            " ".join(words[i : i + n])
            for i in range(max(0, len(words) - n + 1))
        }
        if shingles:
            all_h.extend(
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % _MERSENNE
                for s in shingles
            )
        else:
            all_h.append(0)
        offsets.append(len(all_h))
    if not texts:
        return []
    hs = np.asarray(all_h, dtype=np.int64)
    js = np.arange(num_hashes, dtype=np.int64)
    # (2j+1)·h + 7919·(j+1) ≤ 33·2³¹ + small — comfortably inside int64
    m = ((2 * js + 1)[:, None] * hs[None, :] + (7919 * (js + 1))[:, None]) % _MERSENNE
    sigs = np.minimum.reduceat(m, np.asarray(offsets[:-1]), axis=1)
    rows_per_band = num_hashes // bands
    out: list[list[str]] = []
    for d in range(len(texts)):
        col = sigs[:, d]
        out.append(
            [
                "-".join(
                    str(col[band * rows_per_band + r])
                    for r in range(rows_per_band)
                )
                for band in range(bands)
            ]
        )
    return out


def _update_bucket(
    key: Tuple[int, str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Reference per-bucket update (one state group per (band, bucket))
    — kept as the semantics oracle for the sharded hot path."""
    if state.hasTimedOut:
        state.remove()
        return
    first_doc, n_seen = state.get if state.exists else (None, 0)
    rows = {k: [] for k in (
        "band", "bucket", "doc_id", "first_doc_id", "n_seen_in_bucket",
    )}
    for pdf in pdfs:
        # deterministic arrival order within the micro-batch
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            n_seen += 1
            if first_doc is None:
                first_doc = doc_id
                continue
            rows["band"].append(key[0])
            rows["bucket"].append(key[1])
            rows["doc_id"].append(doc_id)
            rows["first_doc_id"].append(first_doc)
            rows["n_seen_in_bucket"].append(n_seen)
    state.update((first_doc, n_seen))
    if rows["doc_id"]:
        yield pd.DataFrame(rows)


def _make_shard_update(
    ttl_minutes: int | None, evict_after_us: int | None = None
):
    """Shard-keyed update: a bucket→(first_doc, n_seen, last_seen) map
    in parallel-array state; per-bucket semantics identical to
    ``_update_bucket`` (differential-tested).  Per-bucket pruning
    happens inline — last_seen holds wall-clock seconds under
    ``ttl_minutes``, event-time MICROSECONDS under ``evict_after_us``
    — and the group timeout only reaps fully idle shards."""

    def update(key, pdfs, state):
        import time as _time

        if state.hasTimedOut:
            state.remove()
            return
        now = int(_time.time())
        if state.exists:
            bks, fds, nss, lss = state.get
            m = {
                b: [f, ns, ls]
                for b, f, ns, ls in zip(bks, fds, nss, lss)
            }
        else:
            m = {}
        if ttl_minutes is not None and m:
            cutoff = now - ttl_minutes * 60
            m = {b: v for b, v in m.items() if v[2] >= cutoff}
        rows = {k: [] for k in (
            "band", "bucket", "doc_id", "first_doc_id", "n_seen_in_bucket",
        )}
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["band", "bucket", "doc_id"], kind="mergesort"
            )
            if evict_after_us is not None:
                # event-time horizon BEFORE applying the batch: drop
                # buckets whose newest occurrence trails the shard's
                # max event time by more than the horizon
                batch_max = int(pdf["tsu"].max())
                held_max = max(
                    (v[2] for v in m.values()), default=-(1 << 62)
                )
                cutoff = max(batch_max, held_max) - int(evict_after_us)
                m = {b: v for b, v in m.items() if v[2] >= cutoff}
                tsus = pdf["tsu"].to_numpy()
            else:
                tsus = None
            for i, (band, bucket, doc_id) in enumerate(zip(
                pdf["band"], pdf["bucket"], pdf["doc_id"]
            )):
                band, doc_id = int(band), int(doc_id)
                stamp = int(tsus[i]) if tsus is not None else now
                bk = f"{band}|{bucket}"
                ent = m.get(bk)
                if ent is None:
                    m[bk] = [doc_id, 1, stamp]
                    continue
                ent[1] += 1
                ent[2] = max(ent[2], stamp)
                rows["band"].append(band)
                rows["bucket"].append(bucket)
                rows["doc_id"].append(doc_id)
                rows["first_doc_id"].append(ent[0])
                rows["n_seen_in_bucket"].append(ent[1])
        if m:
            bks = list(m)
            state.update(
                (
                    bks,
                    [m[b][0] for b in bks],
                    [m[b][1] for b in bks],
                    [m[b][2] for b in bks],
                )
            )
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60_000)
        elif state.exists:
            state.remove()
        if rows["doc_id"]:
            yield pd.DataFrame(rows)

    return update


def stream_near_dup_candidates(
    stream_df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    ttl_minutes: int | None = None,
    state_shards: int = 4096,
    evict_after_us: int | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(doc_id, text) stream → candidate near-dup rows; see module
    docstring.  One output row per (band, colliding doc); consumers
    ``distinct()`` on (doc_id, first_doc_id) for pair semantics.

    ``state_shards`` caps the state GROUP count (buckets hash into
    shards; per-bucket entries live in a map inside each shard) — size
    it so expected live buckets per shard stay in the hundreds-to-
    thousands; the default suits up to ~10M live buckets.

    ``evict_after_us`` (requires ``ts_col``, mutually exclusive with
    ``ttl_minutes``): per-bucket event-time horizon — see module
    docstring.

    CHECKPOINT CONTRACT: the eviction mode is baked into the persisted
    state — ``last_seen`` holds wall-clock SECONDS under
    ``ttl_minutes`` but event-time MICROSECONDS under
    ``evict_after_us``.  Restarting a checkpointed query with the
    other mode silently misinterprets recency (second-scale stamps all
    fall behind a microsecond horizon, wiping the bucket map).
    Changing the mode requires a fresh checkpoint location."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    if state_shards <= 0:
        raise ValueError("state_shards must be positive")
    if evict_after_us is not None and ttl_minutes is not None:
        raise ValueError(
            "evict_after_us (event time) and ttl_minutes (processing"
            " time) are mutually exclusive"
        )
    if evict_after_us is not None and evict_after_us <= 0:
        raise ValueError("evict_after_us must be positive")

    @F.pandas_udf(ArrayType(StringType()))
    def band_sigs(texts: pd.Series) -> pd.Series:
        return pd.Series(
            _band_signatures_batch(texts.tolist(), num_hashes, bands, n),
            index=texts.index,
        )

    sel = ["doc_id", band_sigs("text").alias("sigs")]
    extra = []
    if evict_after_us is not None:
        sel.append(
            (F.col(ts_col).cast("timestamp").cast("double") * 1_000_000)
            .cast("long")
            .alias("tsu")
        )
        extra = ["tsu"]
    exploded = (
        stream_df.select(*sel)
        .select(
            "doc_id", *extra, F.posexplode("sigs").alias("band", "bucket")
        )
        .select(
            F.col("band").cast("long").alias("band"),
            "bucket",
            "doc_id",
            *extra,
            F.pmod(F.xxhash64("band", "bucket"), F.lit(state_shards)).alias(
                "shard"
            ),
        )
    )

    return exploded.groupBy("shard").applyInPandasWithState(
        _make_shard_update(ttl_minutes, evict_after_us),
        outputStructType=_CANDIDATE_SCHEMA,
        stateStructType=_SHARD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
