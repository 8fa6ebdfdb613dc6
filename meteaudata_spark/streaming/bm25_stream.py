"""Streaming BM25 scoring: a STANDING QUERY over arriving documents —
the alerting / routing / freshness-ranking shape ("score every new doc
against this query as it lands"), twin of the batch ``bm25_search``.

Corpus statistics (df per query term, n_docs, avgdl) are frozen
batch-side — from the persisted index (``build_bm25_index``) or any
reference corpus — and ride into the stream as plain literals, so the
per-batch work is a STATELESS narrow projection: split, count query
terms (in-row, no explode-shuffle), apply the identical micro-unit
scoring formula.  No state store, no watermark; throughput is the
cost of a string split per doc.

Frozen stats mean scores are comparable across micro-batches (and
bit-equal to the batch ranker under the same stats) but drift as the
true corpus grows — re-freeze on whatever cadence the application
needs (the same trade every search engine makes between index
rebuilds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteaudata_spark.ext.textstats import _BM25_B, _BM25_K1


def bm25_query_stats(
    spark: SparkSession,
    index_path: str,
    query_terms: list[str],
    n_buckets: int | None = None,
) -> dict:
    """Freeze the scoring stats for a query from a persisted BM25
    index: {term: df} plus n_docs and avgdl.  Tiny driver-side reads
    (the terms table rows for ≤ a handful of query terms).

    ``n_buckets`` defaults to the value persisted in the index meta
    (``build_bm25_index`` writes it); pruning with a modulus other
    than the build's would read the wrong partitions, find no term
    rows, and every query term would silently score as absent."""
    from meteaudata_spark.ext.textstats import _index_n_buckets

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    meta_df = spark.read.parquet(f"{index_path}/meta")
    if n_buckets is None:
        n_buckets = _index_n_buckets(meta_df)
    meta = meta_df.collect()[0]
    terms = F.array(*[F.lit(t) for t in query_terms])
    # prune to the query terms' bucket partitions exactly like the
    # serving path — without this the stats freeze scans every bucket
    # directory of the terms table
    buckets = sorted(
        {
            r["b"]
            for r in spark.createDataFrame(
                [(t,) for t in query_terms], "term string"
            )
            .select(F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("b"))
            .collect()
        }
    )
    df_rows = (
        spark.read.parquet(f"{index_path}/terms")
        .filter(F.col("bucket").isin(buckets))
        .filter(F.array_contains(terms, F.col("term")))
        .select("term", "df")
        .collect()
    )
    return {
        "n_docs": float(meta["n_docs"]),
        "avgdl": float(meta["avgdl"]),
        "df": {r["term"]: float(r["df"]) for r in df_rows},
    }


def stream_bm25_score(
    stream_df: DataFrame,
    query_terms: list[str],
    stats: dict,
    min_score: float = 0.0,
    k1: float = _BM25_K1,
    b: float = _BM25_B,
) -> DataFrame:
    """(doc_id, text) stream → (doc_id, bm25, n_terms_hit) for docs
    scoring ≥ ``min_score`` against the standing query.

    Pure built-in expressions (works identically on batch frames —
    the differential test drives both): per query term the in-row tf
    is ``size(filter(words, w -> w = term))`` — no explode, so the
    stream stays a stateless projection."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    import math

    n_docs, avgdl = stats["n_docs"], stats["avgdl"]
    words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    dl = F.size(words).cast("double")
    micros = F.lit(0).cast("bigint")
    hits = F.lit(0)
    def _tf_of(term: str):
        # a plain closure — a two-parameter lambda (w, t=t) would be
        # read by pyspark as the (element, index) filter variant
        return F.size(F.filter(words, lambda w: w == F.lit(term))).cast("double")

    for t in query_terms:
        df_t = stats["df"].get(t)
        if not df_t:
            continue  # term absent from the frozen corpus: zero idf
        idf_q = round(math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0) * 1e6) / 1e6
        tf = _tf_of(t)
        term = F.when(
            tf > 0,
            F.round(
                F.lit(idf_q)
                * (tf * (k1 + 1))
                / (tf + k1 * (1 - b + b * dl / F.lit(avgdl)))
                * 1000000.0
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        micros = micros + term
        hits = hits + F.when(tf > 0, 1).otherwise(0)
    return (
        stream_df.select(
            "doc_id",
            (micros / 1000000.0).alias("bm25"),
            hits.cast("bigint").alias("n_terms_hit"),
        )
        .filter(F.col("bm25") >= min_score)
        .filter(F.col("n_terms_hit") > 0)
    )
