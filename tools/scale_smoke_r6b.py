"""Round-6 continuation scale smoke: the four new corpus/embedding
operators at 1M+ rows, all generated executor-side (no driver
materialization).

  1. segment_dedup       — 1M docs, ~5% sharing a boilerplate prefix
  2. pack_sequences      — 10M docs packed within 2048 hash shards
  3. contamination_bloom — 1M corpus docs vs a 10k-doc benchmark
                           (m = 2^22 bits, k = 4)
  4. pq_assign           — 1M 64-dim vectors through the PQ codebook

Usage: python tools/scale_smoke_r6b.py [step ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.corpus_ops import (  # noqa: E402
    contamination_bloom,
    pack_sequences,
)
from meteaudata_spark.ext.dedup import segment_dedup  # noqa: E402
from meteaudata_spark.ext.simsearch import pq_assign  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def _timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f} s  ->  {out}", flush=True)
    return dt


def _synth_docs(spark, n_docs, words=40, boiler_every=20):
    """Docs of pseudo-random words; every boiler_every-th doc starts
    with the same 8-word boilerplate (one shared segment)."""
    body = (
        f"array_join(transform(sequence(1, {words}), "
        f"i -> concat('w', cast(xxhash64(id, i) % 50000 as string))), ' ')"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"CASE WHEN id % {boiler_every} = 0 "
            f"THEN concat('b1 b2 b3 b4 b5 b6 b7 b8 ', {body}) "
            f"ELSE {body} END"
        ).alias("text"),
    )


def smoke_segment_dedup(spark, n_docs=1_000_000):
    d = _synth_docs(spark, n_docs)

    def run():
        out = segment_dedup(d, seg_words=8)
        agg = out.agg(
            F.sum("n_segments").alias("segs"),
            F.sum("n_kept").alias("kept"),
        ).collect()[0]
        dropped = agg["segs"] - agg["kept"]
        # every boilerplate doc but the first loses exactly its one
        # shared segment; random-word segments are unique w.h.p.
        expected = n_docs // 20 - 1
        assert dropped == expected, (dropped, expected)
        return f"{n_docs:,} docs, {agg['segs']:,} segments, {dropped:,} deduped (exact)"

    return _timed(f"segment_dedup {n_docs:,} docs", run)


def smoke_pack_sequences(spark, n_docs=10_000_000, shards=2048):
    d = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(shards)).alias("shard"),
        # 1..63-word docs; text only materialized as its length proxy
        F.expr(
            "array_join(transform(sequence(1, cast(id % 63 + 1 as int)), x -> 'w'), ' ')"
        ).alias("text"),
    )

    def run():
        out = pack_sequences(d, capacity=2048, group_cols=["shard"])
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("bin_fill").alias("max_fill"),
            F.countDistinct("shard", "bin_id").alias("n_bins"),
        ).collect()[0]
        assert agg["n"] == n_docs
        assert agg["max_fill"] <= 2048
        return f"{n_docs:,} docs -> {agg['n_bins']:,} bins, max fill {agg['max_fill']}"

    return _timed(f"pack_sequences {n_docs:,} docs / {shards} shards", run)


def smoke_bloom(spark, n_corpus=1_000_000, n_bench=10_000):
    corpus = _synth_docs(spark, n_corpus, words=30, boiler_every=10**9)
    # bench texts are generated from the same hash stream as corpus
    # docs 0..n_bench-1 -> those corpus docs are fully "contaminated"
    bench = _synth_docs(spark, n_bench, words=30, boiler_every=10**9).select(
        (F.col("doc_id") + n_corpus).alias("doc_id"), F.col("text")
    )

    def run():
        out = contamination_bloom(
            corpus, bench, n=5, m_bits=1 << 22, k=4
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_flagged").alias("flagged"),
            F.sum("n_grams").alias("grams"),
        ).collect()[0]
        rate = agg["flagged"] / agg["grams"]
        return (
            f"{agg['docs']:,} docs, {agg['grams']:,} grams, "
            f"{agg['flagged']:,} flagged ({rate:.4%} incl. Bloom FPs)"
        )

    return _timed(f"contamination_bloom {n_corpus:,} vs {n_bench:,} bench", run)


def smoke_pq(spark, n_vec=1_000_000):
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast(sin(xxhash64(id, i)) as float))"
        ).alias("embedding"),
    )

    def run():
        codes = pq_assign(emb)
        # avg, not sum: per-row sqdist is bounded by 8·(2·2^20)^2 ≈ 2^45,
        # so a bigint SUM over millions of rows would overflow
        agg = codes.agg(
            F.count(F.lit(1)).alias("n"), F.avg("sqdist").alias("err")
        ).collect()[0]
        assert agg["n"] == n_vec * 8
        return f"{n_vec:,} vectors -> {agg['n']:,} codes"

    return _timed(f"pq_assign {n_vec:,} vectors", run)


def smoke_ivfpq(spark, n_vec=1_000_000):
    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast(sin(xxhash64(id, i)) as float))"
        ).alias("embedding"),
    )

    def run():
        from meteaudata_spark.ext.simsearch import ivfpq_topk

        out = ivfpq_topk(emb, n_queries=3, k=10).collect()
        assert len(out) == 30
        return f"{n_vec:,} vectors indexed + searched, 3 queries x top-10"

    return _timed(f"ivfpq_topk {n_vec:,} vectors", run)


def smoke_m4(spark, n_rows=100_000_000, n_keys=1000):
    from meteaudata_spark.ext.timeseries_queries import m4_downsample

    ev = spark.range(n_rows).select(
        F.concat(F.lit("k"), (F.col("id") % n_keys).cast("string")).alias(
            "event_type"
        ),
        F.expr(
            "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,cast(id div 1000 as int))"
        ).alias("ts"),
        F.sin(F.col("id").cast("double")).alias("value"),
    )

    def run():
        # the REAL operator (not a re-implementation): drift-proof
        agg = m4_downsample(ev, ["event_type"])
        n_out = agg.count()
        total = agg.agg(F.sum("n_rows")).collect()[0][0]
        assert total == n_rows
        return f"{n_rows:,} rows -> {n_out:,} M4 buckets (4 pts each)"

    return _timed(f"m4_downsample {n_rows:,} rows / {n_keys} keys", run)


def main() -> None:
    steps = sys.argv[1:] or ["segment", "pack", "bloom", "pq", "ivfpq", "m4"]
    spark = get_spark("scale-smoke-r6b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    import os

    print("loadavg:", os.getloadavg(), flush=True)
    if "segment" in steps:
        smoke_segment_dedup(spark)
    if "pack" in steps:
        smoke_pack_sequences(spark)
    if "bloom" in steps:
        smoke_bloom(spark)
    if "pq" in steps:
        smoke_pq(spark)
    if "ivfpq" in steps:
        smoke_ivfpq(spark)
    if "m4" in steps:
        smoke_m4(spark)
    print("loadavg end:", os.getloadavg(), flush=True)


if __name__ == "__main__":
    main()
