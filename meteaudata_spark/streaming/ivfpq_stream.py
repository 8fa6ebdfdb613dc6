"""Streaming IVF-PQ index ingestion: the online twin of
``simsearch.append_ivfpq_delta`` (VERDICT r13 #5) — new vectors
arriving on a stream are encoded against the persisted index's FROZEN
codebooks and appended into its ``partitionBy(centroid_id)`` layout,
micro-batch by micro-batch.

Shape: ``foreachBatch`` over ``append_ivfpq_delta``.  Each batch pays
one map-only encode of its own rows (two tiny broadcasts — the coarse
centroids and the PQ codebook ride in) plus a batch-sized parquet
append; per-batch cost is O(batch), never O(index) — the scale smoke
measures the flat per-batch profile at 10M vectors.

Delivery semantics: ``foreachBatch`` is at-least-once, and the append
is IDEMPOTENT (``append_ivfpq_delta`` anti-joins arriving vec_ids
against the index's existing codes), so a replayed micro-batch appends
nothing — effectively-once ingestion without a transactional sink.
The same guard makes concurrent producers safe as long as vec_ids are
globally unique (the index's key contract).

Equivalence gate: because the codebooks are frozen, (base index) +
(streamed deltas) is BIT-IDENTICAL to a batch rebuild whenever the
codebook-training vectors live in the base — the differential test
streams ≥3 micro-batches and matches ``ivfpq_search`` results against
a full batch rebuild exactly (the same certificate the
``emb_ivfpq_delta_topk`` gate row holds against DuckDB's independent
rebuild oracle).

100 TB shape: the stream only ever touches (a) its own micro-batch
rows, (b) the two broadcast codebooks, and (c) the slim vec_id column
of the codes relation for the idempotency anti-join.  The inverted
lists stay directory-partitioned, so concurrent readers keep their
``centroid_id`` partition pruning; appends add files, never rewrite.
Reference analog: none (pure [EXT]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_append_ivfpq(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    compact_every: int = 0,
    max_files_per_list: int = 4,
):
    """Start a streaming query appending (vec_id, embedding) rows into
    the persisted IVF-PQ index at ``path`` (built by
    ``build_ivfpq_index``).  Returns the StreamingQuery; callers own
    awaiting / stopping it.

    Restart safety: the checkpoint replays uncommitted micro-batches;
    the vec_id anti-join inside ``append_ivfpq_delta`` makes the
    replay a no-op for rows that already landed.

    ``compact_every=N`` runs ``compact_ivfpq_lists`` after every Nth
    micro-batch: each append adds at most one file per affected list,
    so without compaction a long-running ingest accumulates one file
    per batch per list (the small-files failure mode at 100 TB);
    periodic compaction bounds the per-list file count at
    ``N + max_files_per_list``.  Compaction is itself idempotent and
    crash-safe (maintenance marker), so a replayed batch that re-runs
    it is harmless."""
    from meteaudata_spark.ext.simsearch import (
        append_ivfpq_delta,
        compact_ivfpq_lists,
    )

    cols = set(stream_df.columns)
    if not {"vec_id", "embedding"} <= cols:
        raise ValueError(
            f"stream must have (vec_id, embedding) columns; got {sorted(cols)}"
        )

    def write_batch(bdf, batch_id: int) -> None:
        append_ivfpq_delta(bdf.sparkSession, path, bdf)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_ivfpq_lists(
                bdf.sparkSession, path, max_files_per_list
            )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
