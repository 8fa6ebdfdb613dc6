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
windows over unbounded crawls, compose with a watermark on the event
time column before the aggregation; the ledger semantics per window
are unchanged.
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
) -> DataFrame:
    """Streaming ledger (norm_url, kept_doc_id, n_docs, n_removed)
    over a stream of crawl records.

    ``url_col`` names the recorded-URL column; when None the record
    is decorated with the deterministic doc_id-derived URL (gate /
    test corpora have no URL column — same policy as the batch
    operator).  Works identically on a static DataFrame (the
    differential tests exploit this).
    """
    url: Column = (
        F.col(url_col) if url_col is not None else decorated_url(F.col(id_col))
    )
    normed = records.select(
        F.col(id_col).alias("doc_id"), normalize_url(url).alias("norm_url")
    )
    return (
        normed.groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_removed"),
        )
        .select("norm_url", "kept_doc_id", "n_docs", "n_removed")
    )
