"""Streaming semantic near-duplicate detection: cluster-routed cosine
against a bounded per-cluster representative memory
(``applyInPandasWithState``).

The batch SemDeDup (``ext/simsearch.py:semdedup``) mines within-cluster
PAIRS — a batch-only shape.  The streaming analog answers the online
question: *is this incoming embedding semantically a duplicate of
anything seen so far?*  Per micro-batch:

1. an Arrow-batched Pandas UDF assigns each vector to its nearest
   centroid with the SAME exact integer quantized-L2 argmin as the
   batch path (2²⁰ quantization, float64 sums of integers < 2⁵³ are
   exact, ties to the lowest centroid id) — so a vector routes to the
   same cluster online as it would in batch;
2. ``applyInPandasWithState`` keyed on centroid_id keeps a RING BUFFER
   of up to ``max_reps`` representative embeddings per cluster; an
   arriving vector is compared (one numpy matmul) against its
   cluster's representatives only — the SemDeDup trick, online;
3. cosine ≥ threshold → emit a candidate row and do NOT store the
   duplicate; otherwise the vector becomes a representative (oldest
   evicted when the buffer is full).

State is bounded at ``max_reps × dim`` doubles per cluster regardless
of stream length — the knob trades recall horizon for memory, exactly
like the TTL on the MinHash detector.  Exact re-sends are always
caught while their representative is in the buffer; *chains* of
borderline near-dups can differ from batch pair semantics (the batch
operator compares against dropped vectors too; the online one only
against stored representatives).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_Q = 1 << 20  # same quantizer as ext/simsearch.py

_CANDIDATE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("centroid_id", LongType()),
        StructField("rep_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)

_CLUSTER_STATE_SCHEMA = StructType(
    [
        StructField("rep_ids", ArrayType(LongType())),
        StructField("reps_flat", ArrayType(DoubleType())),
    ]
)


def _update_cluster(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold: float,
    max_reps: int,
    dim: int,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        rep_ids0, reps_flat = state.get
        k0 = len(rep_ids0)
        reps0 = np.asarray(reps_flat, dtype=np.float64).reshape(-1, dim)
    else:
        k0 = 0
        rep_ids0, reps0 = [], np.empty((0, dim), dtype=np.float64)
    rows = {k: [] for k in ("vec_id", "centroid_id", "rep_id", "cosine")}
    # deterministic arrival order within the micro-batch: the iterator
    # yields ARROW-CHUNK-sized frames whose boundaries depend on the
    # shuffle, so the sort must run over the concatenated group, not
    # per chunk
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        order = pd.concat(chunks, ignore_index=True).sort_values("vec_id")
        n_in = len(order)
        # GROW-ONLY buffer (r11 throughput fix): the ring evicts only
        # the OLDEST and appends only at the end, so the live window is
        # always a contiguous slice [lo:hi) of an append-only matrix —
        # no per-arrival np.stack, and the slice preserves arrival
        # order, so argmax's first-max tie-break matches the old list
        # semantics bit for bit (same dgemv, same per-admission norms).
        cap = k0 + n_in
        buf = np.empty((cap, dim), dtype=np.float64)
        nrm = np.empty(cap, dtype=np.float64)
        ids = np.empty(cap, dtype=np.int64)
        if k0:
            buf[:k0] = reps0
            nrm[:k0] = np.maximum(
                np.linalg.norm(reps0, axis=1), 1e-300
            )
            ids[:k0] = np.asarray(rep_ids0, dtype=np.int64)
        lo, hi = 0, k0
        embs = order["embedding"].to_numpy()
        vec_ids = order["vec_id"].to_numpy()
        for i in range(n_in):
            x = np.asarray(embs[i], dtype=np.float64)
            xn = x / max(float(np.linalg.norm(x)), 1e-300)
            if hi > lo:
                sims = (buf[lo:hi] @ xn) / nrm[lo:hi]
                best = int(sims.argmax())
                if round(float(sims[best]), 6) >= threshold:
                    rows["vec_id"].append(int(vec_ids[i]))
                    rows["centroid_id"].append(int(key[0]))
                    rows["rep_id"].append(int(ids[lo + best]))
                    rows["cosine"].append(round(float(sims[best]), 6))
                    continue  # duplicates never become representatives
            buf[hi] = x
            # norm via the same axis=1 reduction the old per-arrival
            # np.linalg.norm(m, axis=1) used (pairwise add.reduce), not
            # the 1-D BLAS-dot path — keeps the cosine denominators
            # bit-identical to the previous implementation
            nrm[hi] = max(
                float(np.linalg.norm(buf[hi : hi + 1], axis=1)[0]), 1e-300
            )
            ids[hi] = int(vec_ids[i])
            hi += 1
            if hi - lo > max_reps:
                lo += 1
        rep_ids = [int(v) for v in ids[lo:hi]]
        reps_out = [float(v) for v in buf[lo:hi].ravel()]
    else:
        rep_ids = list(rep_ids0)
        reps_out = [float(v) for v in reps0.ravel()]
    state.update((rep_ids, reps_out))
    if rows["vec_id"]:
        yield pd.DataFrame(rows)


def stream_semantic_dup_candidates(
    stream_df: DataFrame,
    centroids: list,
    threshold: float = 0.9,
    max_reps: int = 256,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """(vec_id, embedding) stream → candidate semantic-dup rows
    (vec_id, centroid_id, rep_id, cosine); see module docstring.

    ``centroids``: list of (centroid_id, vector) built batch-side
    (``kmeans_refine`` output or a fixed sample) — rides in the UDF
    closure like the batch fast-assign path."""
    if not centroids:
        raise ValueError("need at least one centroid")
    if max_reps <= 0:
        raise ValueError("max_reps must be positive")
    cents = sorted(centroids, key=lambda c: c[0])
    ids = np.array([c[0] for c in cents], dtype=np.int64)
    cm = np.round(
        np.array([c[1] for c in cents], dtype=np.float64) * _Q
    )  # quantized centroid matrix, exact integers
    c_sq = (cm * cm).sum(axis=1)
    dim = cm.shape[1]

    @F.pandas_udf(LongType())
    def assign(embs: pd.Series) -> pd.Series:
        x = np.round(
            np.stack(embs.map(lambda e: np.asarray(e, dtype=np.float64))) * _Q
        )
        dists = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cm.T) + c_sq
        return pd.Series(ids[dists.argmin(axis=1)])

    routed = stream_df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        assign("embedding").alias("centroid_id"),
    )

    def update(key, pdfs, state):
        if ttl_minutes is not None and not state.hasTimedOut:
            state.setTimeoutDuration(ttl_minutes * 60_000)
        yield from _update_cluster(
            key, pdfs, state, threshold, max_reps, dim
        )

    return routed.groupBy("centroid_id").applyInPandasWithState(
        update,
        outputStructType=_CANDIDATE_SCHEMA,
        stateStructType=_CLUSTER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_minutes is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
