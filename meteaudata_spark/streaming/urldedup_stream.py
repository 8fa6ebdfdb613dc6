"""Streaming URL-normalization dedup ledger: the online twin of
``ext/dedup.doc_url_dedup`` — as crawl records arrive, maintain per
normalized URL the running keeper (min doc_id) and occurrence count,
so the ingest layer can route duplicate fetches away from the corpus
in real time.

Unlike the Python-stateful detectors (near-dup, segment dedup), this
one needs NO custom state at all: normalization is a stateless JVM
projection (``normalize_url`` — the same expression chain the batch
operator compiles), and the ledger is Spark's built-in streaming
aggregation (``groupBy(norm_url).agg(min, count)``), which keeps one
JVM state-store row per distinct normalized URL and emits updates in
``update`` output mode.  ``min``/``count`` are order-insensitive, so
ANY micro-batch split of the same records converges to the batch
operator's exact table (differential-tested), with no arrival-order
tiebreak caveat.

State is bounded by DISTINCT normalized-URL cardinality — the same
bound the batch shuffle pays — and lives in the configured state
store (RocksDB spills it off-heap at production scale).  For bounded
state over unbounded crawls, pass ``horizon`` (+ ``ts_col``): the
ledger becomes a per-tumbling-window aggregation behind a watermark
of the same length, so Spark itself retires window state once the
watermark passes (the built-in analog of ``dipspike_stream``'s
``evict_after_us``).  Revival trade-off: a URL recurring in a later
window is re-admitted as that window's keeper — exactly the
re-admission any horizon policy implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meteaudata_spark.ext.dedup import decorated_url, normalize_url


def stream_url_dedup(
    records: DataFrame,
    *,
    url_col: str | None = None,
    id_col: str = "doc_id",
    horizon: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming ledger (norm_url, kept_doc_id, n_docs, n_removed)
    over a stream of crawl records.

    ``url_col`` names the recorded-URL column; when None the record
    is decorated with the deterministic doc_id-derived URL (gate /
    test corpora have no URL column — same policy as the batch
    operator).  Works identically on a static DataFrame (the
    differential tests exploit this).

    ``horizon`` (an interval string like ``"7 days"``, requires
    ``ts_col``) bounds state: the ledger keys become
    (win_start, win_end, norm_url) tumbling windows behind an
    equal-length watermark, and Spark retires each window's state
    once the watermark passes its end — see module docstring for the
    revival trade-off.
    """
    url: Column = (
        F.col(url_col) if url_col is not None else decorated_url(F.col(id_col))
    )
    aggs = [
        F.min("doc_id").alias("kept_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_removed"),
    ]
    if horizon is not None:
        normed = records.select(
            F.col(id_col).alias("doc_id"),
            normalize_url(url).alias("norm_url"),
            F.col(ts_col).cast("timestamp").alias("__ts"),
        )
        if normed.isStreaming:
            normed = normed.withWatermark("__ts", horizon)
        return (
            normed.groupBy(F.window("__ts", horizon), "norm_url")
            .agg(*aggs)
            .select(
                F.col("window.start").alias("win_start"),
                F.col("window.end").alias("win_end"),
                "norm_url",
                "kept_doc_id",
                "n_docs",
                "n_removed",
            )
        )
    normed = records.select(
        F.col(id_col).alias("doc_id"), normalize_url(url).alias("norm_url")
    )
    return (
        normed.groupBy("norm_url")
        .agg(*aggs)
        .select("norm_url", "kept_doc_id", "n_docs", "n_removed")
    )
