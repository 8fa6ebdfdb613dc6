"""Round-6 continuation scale smoke, part c: the newest operators at
1M+ rows, all generated executor-side (no driver materialization).

  1. chunk_text    — 2M docs × ~120 words -> overlapping 40-word chunks
  2. gopher_rules  — 1M docs through the full rule-set core
  3. semdedup      — 500k 64-dim vectors, 256 clusters, planted dups
  4. mp4 codec     — encode/decode throughput for MJPEG-in-MP4 bytes

Usage: python tools/scale_smoke_r6c.py [step ...]   (default: all)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.corpus_ops import chunk_text  # noqa: E402
from meteaudata_spark.ext.simsearch import semdedup  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def _timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f} s  ->  {out}", flush=True)
    return dt


def _synth_docs(spark, n_docs, words):
    body = (
        f"array_join(transform(sequence(1, {words}), "
        f"i -> concat('w', cast(xxhash64(id, i) % 50000 as string))), ' ')"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.expr(body).alias("text")
    )


def smoke_chunk_text(spark, n_docs=2_000_000, words=120):
    d = _synth_docs(spark, n_docs, words)

    def run():
        out = chunk_text(d, window=40, stride=30)
        agg = out.agg(
            F.count(F.lit(1)).alias("chunks"),
            F.sum("n_chunk_words").alias("words"),
        ).collect()[0]
        # 120 words -> 1 + ceil(80/30) = 4 chunks/doc
        assert agg["chunks"] == 4 * n_docs, agg
        return f"{agg['chunks']:,} chunks, {agg['words']:,} chunk-words"

    dt = _timed(f"chunk_text {n_docs:,} docs x {words}w", run)
    print(f"  -> {n_docs / dt:,.0f} docs/s", flush=True)


def smoke_gopher_rules(spark, n_docs=1_000_000):
    """Drive the rule arithmetic (the gate query's core projection) on
    synthetic docs: same expressions, executor-generated input."""
    from meteaudata_spark.ext.textstats import _GOPHER_STOPWORDS

    d = _synth_docs(spark, n_docs, words=60).withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(3)) == 0,
            F.concat(F.lit("the and of "), F.col("text")),
        ).otherwise(F.col("text")),
    )

    def run():
        words = F.split(F.col("text"), " ")
        n_words = F.size(words).cast("double")
        mean_wl = (
            F.aggregate(words, F.lit(0).cast("double"), lambda a, w: a + F.length(w))
            / n_words
        )
        frac_alpha = (
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
            / n_words
        )
        n_stop = F.size(
            F.array_intersect(
                F.array_distinct(words),
                F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
            )
        )
        keep = (
            (n_words >= 50)
            & (mean_wl >= 3.0)
            & (mean_wl <= 10.0)
            & (frac_alpha >= 0.8)
            & (n_stop >= 2)
        )
        agg = d.select(keep.alias("keep")).agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("keep").cast("int")).alias("kept")
        ).collect()[0]
        assert agg["n"] == n_docs
        # only the docs decorated with stopwords can pass the stop rule
        assert agg["kept"] <= n_docs // 3 + 1
        return f"{agg['kept']:,}/{agg['n']:,} kept"

    dt = _timed(f"gopher_rules {n_docs:,} docs", run)
    print(f"  -> {n_docs / dt:,.0f} docs/s", flush=True)


def smoke_semdedup(spark, n_vecs=100_000, n_clusters=256):
    """100k vectors with 1k planted duplicate pairs through 256
    clusters (~390/cluster): semdedup must recover every plant while
    the pair join stays Σ|cluster|² ≈ 20M, never n² = 10G.  Vectors
    are a pure function of (id, dim) so the union's re-evaluation of
    the generator is bit-stable."""
    dim = 64

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            # deterministic elementwise hash -> values in [-1, 1).
            # multiplicative (id+1)*(i+7) mixing, NOT affine in id —
            # an affine grid makes every vector a shifted copy of
            # every other (cosine ≈ 1 corpus-wide)
            grid = (
                (ids[:, None].astype(np.int64) + 1)
                * (np.arange(dim, dtype=np.int64)[None, :] + 7)
                * 2654435761
            ) % 2147483647
            base = (((grid % 100_000) / 50_000.0) - 1.0).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in base], "label": 0}
            )

    emb = (
        spark.range(n_vecs)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
    )
    plants = emb.filter(
        (F.col("vec_id") >= 50_000) & (F.col("vec_id") < 51_000)
    ).select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label")
    full = emb.unionByName(plants)

    def run():
        out = semdedup(full, threshold=0.99, n_clusters=n_clusters)
        n = out.count()
        # every planted copy has an exact lower-id twin in its cluster
        planted_found = out.filter(F.col("drop_id") >= 10_000_000).count()
        assert planted_found == 1_000, planted_found
        return f"{n:,} dropped ({planted_found} planted dups recovered)"

    dt = _timed(f"semdedup {n_vecs:,}+1k vectors, {n_clusters} clusters", run)
    print(f"  -> {(n_vecs + 1000) / dt:,.0f} vecs/s", flush=True)


def smoke_mp4_codec(n_videos=200, frames=12, hw=(48, 64)):
    from meteaudata_spark.ext.mp4 import decode_mp4, encode_mp4_mjpeg

    h, w = hw
    rng = np.random.default_rng(1)
    clip = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(frames)]

    def run():
        total = 0
        for _ in range(n_videos):
            payload = encode_mp4_mjpeg(clip, fps=10, quality=85)
            out, _fps = decode_mp4(payload)
            total += len(out)
        assert total == n_videos * frames
        return f"{total:,} frames round-tripped"

    dt = _timed(f"mp4 codec {n_videos} clips x {frames}f {h}x{w}", run)
    print(f"  -> {n_videos * frames / dt:,.0f} frames/s (single-core; scales per-task)", flush=True)


def smoke_bm25(spark, n_docs=2_000_000, words=120):
    from meteaudata_spark.ext.textstats import bm25_search

    d = _synth_docs(spark, n_docs, words).withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(1000)) == 0,
            F.concat(F.lit("spark table row data query "), F.col("text")),
        ).otherwise(F.col("text")),
    )

    def run():
        out = bm25_search(
            d, ["spark", "table", "row", "data", "query"], k=20
        ).collect()
        assert len(out) == 20
        # planted 5-term docs must own the top ranks
        assert all(r["doc_id"] % 1000 == 0 for r in out), out[:5]
        assert all(r["n_terms_hit"] == 5 for r in out)
        return f"top-20 of {n_docs:,} docs, all planted hits"

    dt = _timed(f"bm25 {n_docs:,} docs x {words}w", run)
    print(f"  -> {n_docs / dt:,.0f} docs/s", flush=True)


def smoke_pagerank(spark, n_nodes=1_000_000, out_deg=10, iters=5):
    """1M-node / 10M-edge synthetic graph through 5 quantized
    PageRank iterations — the iterative keyed-join shape at scale."""
    from meteaudata_spark.ext.graph import pagerank

    edges = (
        spark.range(n_nodes * out_deg)
        .select(
            (F.col("id") % n_nodes).alias("src"),
            F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )

    def run():
        pr = pagerank(edges, iterations=iters)
        agg = pr.agg(
            F.count(F.lit(1)).alias("n"), F.sum("rank").alias("mass")
        ).collect()[0]
        assert agg["n"] >= n_nodes
        # teleport + damped mass stays near 1; the half-up nano
        # quantization adds ~n_nodes*0.5e-9 per iteration upward bias
        assert 0.5 < agg["mass"] <= 1.01, agg
        return f"{agg['n']:,} nodes, total mass {agg['mass']:.4f}"

    dt = _timed(f"pagerank {n_nodes:,} nodes x {out_deg} out-edges, {iters} iters", run)
    print(f"  -> {n_nodes * out_deg * iters / dt:,.0f} edge-visits/s", flush=True)


def smoke_range_join(spark, n_points=10_000_000, n_intervals=10_000):
    """10M points x 10k one-hour intervals through the bucketed range
    join — the shape a nested loop cannot survive."""
    from meteaudata_spark.ext.rangejoin import range_join

    pts = spark.range(n_points).select(
        F.col("id").alias("pid"),
        (F.pmod(F.xxhash64("id"), F.lit(36_000_000))).alias("ts"),
    )
    iv = spark.range(n_intervals).select(
        F.col("id").alias("iid"),
        (F.col("id") * 3600).alias("start"),
        (F.col("id") * 3600 + 3599).alias("end"),
    )

    def run():
        out = range_join(
            pts, iv, ts_col="ts", start_col="start", end_col="end",
            bucket_seconds=3600,
        )
        n = out.count()
        # intervals tile the whole ts range -> every point matches once
        assert n == n_points, n
        return f"{n:,} matched pairs"

    dt = _timed(f"range_join {n_points:,} pts x {n_intervals:,} intervals", run)
    print(f"  -> {n_points / dt:,.0f} points/s", flush=True)


def smoke_bm25_index(spark, n_docs=1_000_000, words=60):
    """Build the persisted inverted index over 1M docs (the persist()
    fix means ONE explode+groupBy pass feeds both writes), then serve
    a query from it."""
    import tempfile

    from meteaudata_spark.ext.textstats import bm25_index_search, build_bm25_index

    d = _synth_docs(spark, n_docs, words).withColumn(
        "text",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(1000)) == 0,
            F.concat(F.lit("spark table row data query "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    idx = tempfile.mkdtemp() + "/bm25"

    def build():
        build_bm25_index(d, idx)
        return "postings + terms + meta written"

    dt = _timed(f"bm25 index build {n_docs:,} docs x {words}w", build)
    print(f"  -> {n_docs / dt:,.0f} docs/s indexed", flush=True)

    def serve():
        out = bm25_index_search(
            spark, idx, ["spark", "table", "row", "data", "query"], k=20
        ).collect()
        assert len(out) == 20 and all(r["doc_id"] % 1000 == 0 for r in out)
        return "top-20 all planted hits"

    dt2 = _timed("bm25 index serve (5-term query)", serve)


if __name__ == "__main__":
    steps = sys.argv[1:] or ["chunk", "gopher", "semdedup", "mp4", "bm25", "pagerank", "rangejoin", "bm25index"]
    spark = get_spark("scale-smoke-r6c")
    spark.sparkContext.setLogLevel("ERROR")
    if "chunk" in steps:
        smoke_chunk_text(spark)
    if "gopher" in steps:
        smoke_gopher_rules(spark)
    if "semdedup" in steps:
        smoke_semdedup(spark)
    if "mp4" in steps:
        smoke_mp4_codec()
    if "bm25" in steps:
        smoke_bm25(spark)
    if "pagerank" in steps:
        smoke_pagerank(spark)
    if "rangejoin" in steps:
        smoke_range_join(spark)
    if "bm25index" in steps:
        smoke_bm25_index(spark)
