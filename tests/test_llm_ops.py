"""Round-6 continuation LLM-pipeline operators: segment-level dedup,
sequence packing, Bloom decontamination, PQ codes/top-k, and the
STL-lite seasonal decomposition.  Differential/oracle coverage runs
via tools/check_correctness.py; these tests pin SEMANTICS on
hand-built corpora."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from meteaudata_spark.ext import corpus_ops as C
from meteaudata_spark.ext import relational
from meteaudata_spark.ext import simsearch as SS
from meteaudata_spark.ext import timeseries_queries as tsq
from meteaudata_spark.ext.dedup import segment_dedup


def _docs_df(spark, texts, langs=None):
    rows = [
        {"doc_id": i, "text": t, "lang": (langs[i] if langs else "en")}
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


# ----------------------------------------------------------------------
# segment-level dedup
# ----------------------------------------------------------------------
def test_segment_dedup_drops_repeated_boilerplate(spark):
    boiler = "one two three four"  # 4 words = one segment at seg_words=4
    d = _docs_df(
        spark,
        [
            boiler + " unique tail words here",   # doc 0: first occurrence
            boiler + " other content entirely differs",  # doc 1: boiler repeated
            "totally fresh document with no overlap",    # doc 2: untouched
        ],
    )
    out = {
        r["doc_id"]: r for r in segment_dedup(d, seg_words=4).collect()
    }
    assert out[0]["n_segments"] == 2 and out[0]["n_kept"] == 2
    # doc 1 loses exactly the boilerplate segment
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == out[2]["n_segments"] == 2


def test_segment_dedup_hash_is_reassembled_kept_text(spark):
    import hashlib

    d = _docs_df(spark, ["a b c d e f g h", "a b c d x y z w"])
    out = {r["doc_id"]: r for r in segment_dedup(d, seg_words=4).collect()}
    # doc 1 keeps only its second segment; hash must be md5 of that text
    assert out[1]["dedup_hash"] == hashlib.md5(b"x y z w").hexdigest()
    assert out[0]["dedup_hash"] == hashlib.md5(b"a b c d e f g h").hexdigest()


def test_segment_dedup_fully_duplicate_doc_keeps_nothing(spark):
    d = _docs_df(spark, ["p q r s", "p q r s"])
    out = {r["doc_id"]: r for r in segment_dedup(d, seg_words=4).collect()}
    import hashlib

    assert out[1]["n_kept"] == 0
    assert out[1]["dedup_hash"] == hashlib.md5(b"").hexdigest()


# ----------------------------------------------------------------------
# sequence packing
# ----------------------------------------------------------------------
def test_pack_sequences_greedy_semantics(spark):
    # token counts: 3, 3, 3, 10, 2  with capacity 7
    texts = [
        "a a a",          # bin 0 (fill 3)
        "b b b",          # bin 0 (fill 6)
        "c c c",          # overflow -> bin 1 (fill 3)
        "d d d d d d d d d d",  # 10 > capacity -> bin 2 alone (fill 10)
        "e e",            # 10+2 > 7 -> bin 3 (fill 2)
    ]
    d = _docs_df(spark, texts)
    out = (
        C.pack_sequences(d, capacity=7, group_cols=["lang"])
        .orderBy("doc_id")
        .collect()
    )
    assert [r["bin_id"] for r in out] == [0, 0, 1, 2, 3]
    assert [r["bin_fill"] for r in out] == [3, 6, 3, 10, 2]


def test_pack_sequences_partition_invariant_and_no_overflow(spark):
    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        # variable-length docs: 1..20 words
        F.expr("array_join(transform(sequence(1, cast(id % 20 + 1 as int)), x -> 'w'), ' ')").alias(
            "text"
        ),
    )
    a = C.pack_sequences(d, capacity=64).orderBy("doc_id").collect()
    b = (
        C.pack_sequences(d.repartition(16), capacity=64)
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # no bin overflows unless a single doc alone exceeds capacity
    fills = {}
    for r in a:
        key = (r["lang"], r["bin_id"])
        fills.setdefault(key, []).append(r["n_tokens"])
    for docs in fills.values():
        assert sum(docs) <= 64 or len(docs) == 1


# ----------------------------------------------------------------------
# Bloom decontamination
# ----------------------------------------------------------------------
def test_bloom_flags_are_superset_of_exact_overlap(spark):
    sf = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in C.doc_contamination(spark, sf).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in C.doc_contamination_bloom(spark, sf).collect()
    }
    assert set(exact) == set(bloom)
    # Bloom never misses a true overlap (no false negatives)
    for doc_id, n_ov in exact.items():
        assert bloom[doc_id] >= n_ov
    # ... and is not trivially flagging everything: global false-positive
    # mass stays small next to the corpus gram count
    n_grams = sum(
        r["n_grams"] for r in C.doc_contamination(spark, sf).collect()
    )
    fp = sum(bloom.values()) - sum(exact.values())
    assert fp <= 0.05 * n_grams


def test_bloom_detects_planted_contamination(spark):
    bench = _docs_df(spark, ["alpha beta gamma delta epsilon zeta eta theta"])
    corpus = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 50, "text": "x alpha beta gamma delta epsilon y z w q"},
                {"doc_id": 51, "text": "nothing shared here at all with that set"},
            ]
        )
    )
    out = {
        r["doc_id"]: r["n_flagged"]
        for r in C.contamination_bloom(corpus, bench).collect()
    }
    assert out[50] >= 1  # the verbatim 5-gram must be flagged
    # false-positive probability for any single gram at m=8192,k=3 and
    # ~4 bench grams is ~(12/8192)^3 — doc 51 must stay clean
    assert out[51] == 0


# ----------------------------------------------------------------------
# product quantization
# ----------------------------------------------------------------------
def test_pq_codebook_vectors_snap_to_themselves(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    codes = SS.pq_assign(emb).filter(F.col("vec_id") < 16).collect()
    for r in codes:
        assert r["code"] == r["vec_id"]
        assert r["sqdist"] == 0


def test_pq_topk_finds_planted_duplicate(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    # plant an exact copy of query vector 0 under a fresh id
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    out = SS.pq_topk(emb.unionByName(dup), n_queries=1, k=3).collect()
    top1 = [r for r in out if r["rank"] == 1][0]
    assert top1["vec_id"] == 100000
    assert top1["approx_sqdist"] == 0


def test_pq_codes_shape_and_range(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = emb.count()
    codes = SS.pq_assign(emb)
    assert codes.count() == n * 8
    stats = codes.agg(
        F.min("code").alias("lo"), F.max("code").alias("hi")
    ).collect()[0]
    assert 0 <= stats["lo"] and stats["hi"] < 16


# ----------------------------------------------------------------------
# seasonal decomposition
# ----------------------------------------------------------------------
def test_seasonal_decompose_additive_identity(spark):
    sf = "/root/testdata/sf0.001"
    rows = tsq.ts_seasonal_decompose(spark, sf).collect()
    assert rows
    for r in rows:
        # v = trend + seasonal + residual up to the 4 independent 1e-6
        # roundings
        assert abs(
            r["hourly_avg"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) <= 4e-6


def test_seasonal_decompose_recovers_pure_cycle(spark):
    # synthetic series: value depends ONLY on hour-of-day -> residual 0
    # and flat trend once the centered MA window is fully populated
    ev = spark.range(24 * 14).select(
        F.lit(1).alias("event_id"),
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)").alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("a").alias("event_type"),
        (F.pmod(F.hour(F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)")), F.lit(24))).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        out = tsq.ts_seasonal_decompose(spark, td).collect()
    # interior buckets (full ±12 window): the 25-bucket centered MA of a
    # 24-period sawtooth is NOT constant, but seasonal+residual must
    # reconstruct v exactly; check the additive identity plus bounded
    # residuals in the interior
    assert len(out) == 24 * 14
    interior = sorted(out, key=lambda r: r["bucket_ts"])[12:-12]
    assert max(abs(r["residual"]) for r in interior) < 1.0


# ----------------------------------------------------------------------
# IVF-PQ
# ----------------------------------------------------------------------
def test_ivfpq_finds_planted_duplicate(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    out = SS.ivfpq_topk(emb.unionByName(dup), n_queries=1, k=5).collect()
    by_rank = {r["rank"]: r for r in out}
    # the exact copy shares the query's coarse cell and PQ codes, so
    # its ADC distance equals the query's own reconstruction error —
    # the minimum any vector with those codes can achieve
    assert by_rank[1]["vec_id"] == 100000


def test_ivfpq_subset_of_probed_lists_only(spark):
    sf = "/root/testdata/sf0.001"
    from meteaudata_spark.ext.simsearch import emb_ivfpq_topk

    out = emb_ivfpq_topk(spark, sf)
    rows = out.collect()
    assert len(rows) == 30  # 3 queries × top-10
    for r in rows:
        assert r["approx_sqdist"] >= 0


# ----------------------------------------------------------------------
# bigram likelihood
# ----------------------------------------------------------------------
def test_bigram_likelihood_ranks_fluent_above_shuffled(spark, tmp_path):
    import os
    from meteaudata_spark.ext import textstats as T

    # corpus of many fluent repeats + one scrambled doc: the repeated
    # phrase's bigrams are high-probability, the scramble's are rare
    fluent = "the quick brown fox jumps over the lazy dog"
    docs = [(i, fluent, "en") for i in range(20)]
    docs.append((20, "dog the over quick lazy fox brown jumps the", "en"))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text", "lang"])
    path = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    out = {
        r["doc_id"]: r["avg_bigram_prob"]
        for r in T.doc_bigram_likelihood(spark, str(tmp_path)).collect()
    }
    fluent_score = out[0]
    assert all(out[i] == fluent_score for i in range(20))
    assert out[20] < fluent_score


def test_bigram_likelihood_probability_bounds(spark):
    from meteaudata_spark.ext import textstats as T

    rows = T.doc_bigram_likelihood(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["avg_bigram_prob"] <= 1.0


# ----------------------------------------------------------------------
# histogram quantile sketch
# ----------------------------------------------------------------------
def test_hist_quantiles_within_bin_width_of_exact(spark):
    from meteaudata_spark.ext.sketches import hist_quantiles, _HQ_BINS
    from meteaudata_spark.sources.tables import load_table

    import math

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = {
        (r["event_type"], r["q"]): r["est"]
        for r in hist_quantiles(ev, "value", ["event_type"]).collect()
    }
    # the sketch's guarantee is vs the ceil(q*n)-th ORDER STATISTIC
    # (its rank convention), within one bin width — NOT vs type-7
    # interpolated percentile, which with a sparse tail can sit far
    # from any order statistic's bin
    by_type = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for et, vals in by_type.items():
        vals.sort()
        width = (vals[-1] - vals[0]) / _HQ_BINS
        for q in (0.5, 0.9, 0.99):
            k = math.ceil(q * len(vals))
            exact = vals[k - 1]
            est = got[(et, q)]
            assert abs(est - exact) <= width + 1e-9, (
                et, q, est, exact, width
            )


def test_hist_quantiles_exact_on_uniform_grid(spark):
    from meteaudata_spark.ext.sketches import hist_quantiles

    # 256 values 0..255 into 256 bins: every bin holds exactly one
    # value, so interpolation must land inside the right bin
    df = spark.range(256).select(
        F.lit("k").alias("g"), F.col("id").cast("double").alias("v")
    )
    out = {r["q"]: r["est"] for r in hist_quantiles(df, "v", ["g"]).collect()}
    assert abs(out[0.5] - 127.5) <= 1.0
    assert abs(out[0.9] - 229.5) <= 1.0


# ----------------------------------------------------------------------
# domain mixture
# ----------------------------------------------------------------------
def test_domain_mixture_binding_group_keeps_all(spark):
    from meteaudata_spark.ext.corpus_ops import domain_mixture

    # groups: a=1000 docs, b=100 docs; target 50/50 -> b binds (N=200),
    # a keeps ~10%, b keeps 100%
    d = spark.range(1100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "a").otherwise("b").alias("lang"),
    )
    out = {
        r["lang"]: r
        for r in domain_mixture(d, {"a": 50, "b": 50}).collect()
    }
    assert out["b"]["n_kept"] == 100  # binding group: keep everything
    # a's keep count is hash-binomial around 100 (threshold 10%)
    assert abs(out["a"]["n_kept"] - 100) < 40


def test_domain_mixture_unweighted_group_dropped(spark):
    from meteaudata_spark.ext.corpus_ops import domain_mixture

    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("lang"),
    )
    out = {r["lang"]: r for r in domain_mixture(d, {"x": 100}).collect()}
    assert out["y"]["n_kept"] == 0
    assert out["x"]["n_kept"] == 100  # sole weighted group keeps all


# ----------------------------------------------------------------------
# persisted IVF-PQ index
# ----------------------------------------------------------------------
def test_ivfpq_persisted_index_matches_inmemory(spark, tmp_path):
    from meteaudata_spark.ext.simsearch import (
        build_ivfpq_index,
        ivfpq_search,
        ivfpq_topk,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx)
    queries = emb.filter(F.col("vec_id") < 3)
    got = ivfpq_search(spark, idx, queries).collect()
    want = ivfpq_topk(emb, n_queries=3, k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ivfpq_search_prunes_unprobed_lists(spark, tmp_path):
    from meteaudata_spark.ext.simsearch import (
        build_ivfpq_index,
        ivfpq_search,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, idx)
    out = ivfpq_search(spark, idx, emb.filter(F.col("vec_id") < 1))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the codes scan must carry a centroid_id partition filter — the
    # unprobed inverted lists are pruned at the directory level
    assert "PartitionFilters" in plan
    import re

    pf = re.findall(r"PartitionFilters: \[[^\]]*centroid_id[^\]]*\]", plan)
    assert pf, plan[:2000]


# ----------------------------------------------------------------------
# seasonal anomaly
# ----------------------------------------------------------------------
def test_seasonal_anomaly_flags_planted_spike(spark, tmp_path):
    import os

    # pure 24h cycle for 14 days + one bucket with a massive spike:
    # plain value fences would flag every daily peak; residual fences
    # must flag ONLY the spike
    n = 24 * 14
    ts_expr = (
        "timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,cast(id as int),0,0)"
    )
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.expr(ts_expr).alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("a").alias("event_type"),
        (
            F.pmod(F.hour(F.expr(ts_expr)), F.lit(24)).cast("double") * 10.0
            + F.when(F.col("id") == 100, 500.0).otherwise(0.0)
        ).alias("value"),
        F.lit("{}").alias("props"),
    )
    with __import__("tempfile").TemporaryDirectory() as td:
        ev.write.parquet(os.path.join(td, "events.parquet"))
        out = tsq.ts_seasonal_anomaly(spark, td).collect()
    flagged_hours = {r["bucket_ts"].hour + 24 * (r["bucket_ts"].day - 1) for r in out}
    assert 100 in flagged_hours
    # allowed co-flags: the spike's own ±12h moving-average window,
    # the first/last 12 partial-window buckets (centered-MA edge
    # bias), and other days' hour-4 slots — the mean-based seasonal
    # profile spreads the spike across its hour-of-day (a median
    # profile would suppress that; the oracle-matched formulation is
    # the classical mean).  Everything else must stay quiet: the
    # daily peaks themselves never flag.
    quiet = [
        h
        for h in flagged_hours
        if 13 <= h <= n - 13 and abs(h - 100) > 13 and h % 24 != 100 % 24
    ]
    assert quiet == [], quiet


def test_bigram_likelihood_survives_one_word_docs(spark, tmp_path):
    import os
    from meteaudata_spark.ext import textstats as T

    pdf = pd.DataFrame(
        [(0, "solo", "en"), (1, "two words here now", "en")],
        columns=["doc_id", "text", "lang"],
    )
    spark.createDataFrame(pdf).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    out = {r["doc_id"]: r for r in T.doc_bigram_likelihood(spark, str(tmp_path)).collect()}
    # the 1-word doc has no bigrams: absent from output (group never
    # forms), and crucially the query does not fault under ANSI
    assert 0 not in out
    assert out[1]["n_bigrams"] == 3


# ----------------------------------------------------------------------
# ANSI edge-case guards (short docs, constant groups)
# ----------------------------------------------------------------------
def test_shingles_empty_for_short_docs(spark):
    from meteaudata_spark.ext.dedup import _shingles

    d = _docs_df(spark, ["one two", "a b c d"])
    got = sorted(
        (r["doc_id"], r["shingle"]) for r in _shingles(d, 3).collect()
    )
    # the 2-word doc emits nothing (and does not fault under ANSI)
    assert got == [(1, "a b c"), (1, "b c d")]


def test_hist_quantiles_constant_group(spark):
    from meteaudata_spark.ext.sketches import hist_quantiles

    c = spark.range(10).select(
        F.lit("g").alias("g"), F.lit(5.0).alias("v")
    )
    out = {r["q"]: r["est"] for r in hist_quantiles(c, "v", ["g"]).collect()}
    assert out == {0.5: 5.0, 0.9: 5.0, 0.99: 5.0}


def test_pack_sequences_null_and_empty_text(spark):
    d = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 0, "text": "a b c", "lang": "en"},
                {"doc_id": 1, "text": None, "lang": "en"},
                {"doc_id": 2, "text": "", "lang": "en"},
            ]
        )
    )
    out = {
        r["doc_id"]: r for r in C.pack_sequences(d, capacity=10).collect()
    }
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert out[0]["bin_id"] == out[1]["bin_id"] == out[2]["bin_id"] == 0


# ----------------------------------------------------------------------
# M4 downsampling
# ----------------------------------------------------------------------
def test_m4_preserves_global_extrema_and_bounds_output(spark):
    sf = "/root/testdata/sf0.001"
    out = tsq.ts_m4_downsample(spark, sf).collect()
    ev = tsq._events(spark, sf)
    exact = {
        r["event_type"]: (r["vmin"], r["vmax"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    by_type = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rows in by_type.items():
        # ≤ 100 buckets regardless of input size, every row accounted
        assert len(rows) <= 100
        assert sum(r["n_rows"] for r in rows) == exact[et][2]
        # the global min/max survive downsampling exactly (modulo _r6)
        assert abs(min(r["min_v"] for r in rows) - exact[et][0]) < 1e-6
        assert abs(max(r["max_v"] for r in rows) - exact[et][1]) < 1e-6
        for r in rows:
            # within a bucket: first/last bracket the epoch range and
            # min ≤ max
            assert r["first_e"] <= r["last_e"]
            assert r["min_v"] <= r["max_v"]


# ----------------------------------------------------------------------
# URL stats
# ----------------------------------------------------------------------
def test_url_stats_counts_planted_urls(spark):
    from meteaudata_spark.ext import textstats as T

    out = {r["domain"]: r for r in T.doc_url_stats(spark, "/root/testdata/sf0.001").collect()}
    # 7 site domains + 3 ref domains, every doc contributes one of each
    sites = [d for d in out if d.startswith("site")]
    refs = [d for d in out if d.startswith("ref")]
    assert len(sites) == 7 and len(refs) == 3
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert sum(out[d]["n_urls"] for d in sites) == n_docs
    assert sum(out[d]["n_urls"] for d in refs) == n_docs


def test_hist_quantiles_ignores_null_values(spark):
    from meteaudata_spark.ext.sketches import hist_quantiles

    d = spark.range(100).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 2 == 0, F.col("id").cast("double")).alias("v"),
    )
    # 50 non-null values 0,2,...,98 + 50 nulls: quantiles must be
    # computed over the non-nulls only (nulls formerly inflated every
    # cumulative count via the NULLS FIRST window)
    out = {r["q"]: r["est"] for r in hist_quantiles(d, "v", ["g"]).collect()}
    assert abs(out[0.5] - 48) <= 2.0, out
    assert abs(out[0.9] - 88) <= 2.0, out


# ----------------------------------------------------------------------
# RAG chunking
# ----------------------------------------------------------------------
def test_chunk_text_windows_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    d = _docs_df(spark, [" ".join(words)])
    out = (
        C.chunk_text(d, window=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    # n=10, W=4, S=3 -> 1 + ceil(6/3) = 3 chunks
    assert [r["chunk_id"] for r in out] == [0, 1, 2]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"
    assert out[2]["chunk_text"] == "w6 w7 w8 w9"
    assert [r["n_chunk_words"] for r in out] == [4, 4, 4]


def test_chunk_text_short_doc_single_chunk_and_ragged_tail(spark):
    d = _docs_df(spark, ["a b", " ".join(f"w{i}" for i in range(5))])
    rows = C.chunk_text(d, window=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["chunk_text"] == "a b"
    # n=5 -> 2 chunks, the second is the ragged 2-word tail
    tails = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["n_chunk_words"] for r in tails] == [4, 2]
    assert tails[1]["chunk_text"] == "w3 w4"


def test_chunk_text_covers_every_word(spark):
    texts = [" ".join(f"d{j}w{i}" for i in range(n)) for j, n in enumerate([1, 7, 40, 93])]
    d = _docs_df(spark, texts)
    rows = C.chunk_text(d, window=16, stride=11).collect()
    covered = {w for r in rows for w in r["chunk_text"].split(" ")}
    expected = {w for t in texts for w in t.split(" ")}
    assert covered == expected


def test_chunk_text_rejects_bad_knobs(spark):
    d = _docs_df(spark, ["a b c"])
    with pytest.raises(ValueError):
        C.chunk_text(d, window=0)
    with pytest.raises(ValueError):
        C.chunk_text(d, stride=-1)
    with pytest.raises(ValueError):
        C.chunk_text(d, window=4, stride=5)  # gaps skip words


# ----------------------------------------------------------------------
# Gopher rule-set
# ----------------------------------------------------------------------
def test_gopher_rules_flags(spark, tmp_path):
    from meteaudata_spark.ext import textstats as T

    good = " ".join(
        ["the", "and"] + [f"wordy{i}" for i in range(58)]
    )  # 60 alpha words, 2 stopwords, mean len in band
    short = "tiny doc here"  # fails word-count band
    numeric = " ".join(["the", "and"] + ["12345"] * 58)  # alpha share 2/60
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],  # ids avoid the %5/%7 decoration branches
            "text": [good, short, numeric],
            "lang": ["en"] * 3,
            "source": ["t"] * 3,
            "n_chars": [len(good), len(short), len(numeric)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in T.doc_gopher_rules(spark, str(tmp_path)).collect()}
    assert out[1]["keep"] is True and out[1]["n_stopwords"] == 2
    assert out[2]["keep"] is False and out[2]["ok_word_count"] is False
    assert out[3]["ok_alpha_words"] is False
    assert abs(out[3]["frac_alpha_words"] - 2 / 60) < 1e-6


def test_gopher_rules_line_decorations(spark, tmp_path):
    from meteaudata_spark.ext import textstats as T

    base = " ".join(f"w{i}" for i in range(50))
    pd.DataFrame(
        {
            "doc_id": [7, 10],  # %7 -> bullets, %5 -> ellipsis lines
            "text": [base, base],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [len(base)] * 2,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = {r["doc_id"]: r for r in T.doc_gopher_rules(spark, str(tmp_path)).collect()}
    assert abs(out[7]["frac_bullet_lines"] - 3 / 4) < 1e-6
    assert out[7]["frac_ellipsis_lines"] == 0.0
    assert abs(out[10]["frac_ellipsis_lines"] - 2 / 3) < 1e-6
    assert out[10]["ok_ellipsis_lines"] is False  # 2/3 > 0.3


# ----------------------------------------------------------------------
# SemDeDup
# ----------------------------------------------------------------------
def test_semdedup_matches_brute_force_within_clusters(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    n, dim, thr = 140, 64, 0.2
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[137] = vecs[3]  # planted exact dup, likely same cluster
    d = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(n), "embedding": [v.tolist() for v in vecs], "label": 0}
        )
    )
    out = {r["drop_id"]: r for r in SS.semdedup(d, threshold=thr).collect()}

    # brute-force replica: integer-quantized assignment + pairwise cosine
    q = np.round(vecs.astype(np.float64) * (2**20)).astype(np.int64)
    cent_ids = list(range(100, 116))
    dists = ((q[:, None, :] - q[None, cent_ids, :]) ** 2).sum(axis=2)
    assign = dists.argmin(axis=1)  # ties break to lower centroid via argmin
    nrm = np.sqrt((vecs.astype(np.float64) ** 2).sum(axis=1))
    expected = {}
    for b in range(n):
        keeps = [
            a
            for a in range(b)
            if assign[a] == assign[b]
            and round(float(vecs[a].astype(np.float64) @ vecs[b].astype(np.float64)) / (nrm[a] * nrm[b]), 6) >= thr
        ]
        if keeps:
            expected[b] = min(keeps)
    assert {k: v["keep_id"] for k, v in out.items()} == expected
    assert 137 in expected  # the planted dup was actually exercised


def test_semdedup_never_compares_across_clusters(spark):
    import numpy as np

    # two orthogonal bundles, each glued to its own centroid; cross-pairs
    # have cosine 0 anyway, but the assertion is on pair provenance
    rng = np.random.default_rng(7)
    base_a = np.zeros(64, np.float32); base_a[0] = 1.0
    base_b = np.zeros(64, np.float32); base_b[1] = 1.0
    rows = []
    for i in range(100):
        rows.append((i, (base_a if i % 2 == 0 else base_b) + 0.001 * rng.normal(size=64).astype(np.float32)))
    for cid in range(100, 116):
        if cid == 100:
            v = base_a
        elif cid == 101:
            v = base_b
        else:
            # park the other 14 centroids far away so no corpus vector
            # can land on them
            v = np.zeros(64, np.float32)
            v[cid - 100] = 5.0
        rows.append((cid, v + 0.001 * rng.normal(size=64).astype(np.float32)))
    d = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [r[0] for r in rows], "embedding": [np.asarray(r[1], np.float32).tolist() for r in rows], "label": 0}
        )
    )
    out = SS.semdedup(d, threshold=0.9).collect()
    assert len(out) > 0
    cents = {r["centroid_id"] for r in out}
    assert cents <= {100, 101}  # bundle A -> 100, bundle B -> its nearest B-centroid


# ----------------------------------------------------------------------
# autocorrelation
# ----------------------------------------------------------------------
def test_autocorr_recovers_planted_period(spark, tmp_path):
    """A 600 s-period square wave sampled every 300 s: ACF must be
    exactly +1 at the full-period lag (2 buckets) and -1 at the
    half-period lag (1 bucket)."""
    import numpy as np

    n = 200
    ts = pd.date_range("2024-01-01", freq="300s", periods=n)
    vals = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": 0,
            "event_type": "wave",
            "value": vals,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = {r["lag"]: r for r in tsq.ts_autocorr(spark, str(tmp_path)).collect()}
    assert abs(out[1]["acf"] + 1.0) < 1e-6
    assert abs(out[2]["acf"] - 1.0) < 1e-6
    assert abs(out[3]["acf"] + 1.0) < 1e-6
    # pair counts shrink by one per extra lag step
    assert out[1]["n_pairs"] == n - 1 and out[2]["n_pairs"] == n - 2


def test_semdedup_fast_assign_equals_fold(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    fast = sorted(
        tuple(r) for r in SS.semdedup(emb, threshold=0.3, fast_assign=True).collect()
    )
    fold = sorted(
        tuple(r) for r in SS.semdedup(emb, threshold=0.3, fast_assign=False).collect()
    )
    assert fast == fold and len(fast) > 0


def test_holt_trend_converges_on_linear_ramp(spark, tmp_path):
    """On a pure linear ramp the Holt trend state must converge to the
    per-bucket slope and the one-step forecast to the next value."""
    n = 120
    ts = pd.date_range("2024-01-01", freq="300s", periods=n)
    vals = 10.0 + 0.5 * np.arange(n)  # slope 0.5 per bucket
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": 0,
            "event_type": "ramp",
            "value": vals,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = sorted(
        tsq.ts_holt(spark, str(tmp_path)).collect(), key=lambda r: r["b5"]
    )
    assert abs(rows[-1]["trend"] - 0.5) < 1e-6
    assert abs(rows[-1]["level"] - vals[-1]) < 1e-3
    assert abs(rows[-1]["forecast_next"] - (vals[-1] + 0.5)) < 1e-3


def test_winsorize_clips_planted_outliers(spark, tmp_path):
    n = 200
    ts = pd.date_range("2024-01-01", freq="60s", periods=n)
    vals = np.ones(n)
    vals[7] = 1e6   # high outlier
    vals[13] = -1e6  # low outlier
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": 0,
            "event_type": "w",
            "value": vals,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    r = tsq.ts_winsorize(spark, str(tmp_path)).collect()[0]
    assert r["n_clipped_low"] == 1 and r["n_clipped_high"] == 1
    # 198 ones + two clipped fence values ~1 -> mean ~1
    assert abs(r["winsorized_mean"] - 1.0) < 0.1


def test_trend_slope_recovers_planted_drift(spark, tmp_path):
    n = 240
    ts = pd.date_range("2024-01-01", freq="300s", periods=n)
    vals = 5.0 + 2.4 * np.arange(n) / 12.0  # 2.4 per hour
    pd.DataFrame(
        {
            "event_id": range(n),
            "ts": ts,
            "user_id": 0,
            "event_type": "drift",
            "value": vals,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    r = tsq.ts_trend_slope(spark, str(tmp_path)).collect()[0]
    assert abs(r["slope_per_hour"] - 2.4) < 1e-6
    assert abs(r["intercept"] - 5.0) < 1e-6


def test_bm25_ranks_term_dense_doc_first(spark):
    from meteaudata_spark.ext.textstats import bm25_search

    d = _docs_df(
        spark,
        [
            "spark query spark data spark table",   # doc 0: dense in query terms
            "row data filler filler filler filler", # doc 1: two terms
            "nothing relevant here at all today",   # doc 2: zero terms
            "table " + "filler " * 50,              # doc 3: one term, long doc
        ],
    )
    out = bm25_search(d, ["spark", "table", "row", "data", "query"], k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["doc_id"] == 0
    assert {r["doc_id"] for r in out} == {0, 1, 3}  # zero-hit docs never appear
    # doc length penalizes: the long one-term doc scores below the
    # short two-term doc
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert scores[1] > scores[3]
    assert all(r["bm25"] > 0 for r in out)


def test_bm25_rejects_empty_query(spark):
    from meteaudata_spark.ext.textstats import bm25_search

    with pytest.raises(ValueError):
        bm25_search(_docs_df(spark, ["x"]), [])


def test_hybrid_rrf_prefers_docs_in_both_rankers(spark):
    from meteaudata_spark.ext.textstats import hybrid_search_rrf

    lex = spark.createDataFrame(
        pd.DataFrame({"doc_id": [10, 11, 12], "rank": [1, 2, 3]})
    )
    sem = spark.createDataFrame(
        pd.DataFrame({"doc_id": [12, 13, 14], "rank": [1, 2, 3]})
    )
    out = sorted(
        hybrid_search_rrf(lex, sem, k=10).collect(), key=lambda r: r["rank"]
    )
    # doc 12 (rank 3 lexical + rank 1 semantic) beats every single-
    # ranker doc, including both rank-1s
    assert out[0]["doc_id"] == 12
    assert out[0]["in_lexical"] and out[0]["in_semantic"]
    assert abs(out[0]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-6
    # singles ordered by their own rank; 11 (lex rank 2) and 13 (sem
    # rank 2) score identically (1/62) and tie-break by doc_id
    assert [r["doc_id"] for r in out] == [12, 10, 11, 13, 14]


def test_bm25_persisted_index_matches_inmemory(spark, tmp_path):
    from meteaudata_spark.ext.textstats import (
        _BM25_QUERY,
        bm25_search,
        build_bm25_index,
        bm25_index_search,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx)
    served = sorted(
        tuple(r) for r in bm25_index_search(spark, idx, _BM25_QUERY).collect()
    )
    direct = sorted(tuple(r) for r in bm25_search(docs, _BM25_QUERY).collect())
    assert served == direct and len(served) == 20


def test_bm25_index_prunes_unqueried_buckets(spark, tmp_path):
    import re

    from meteaudata_spark.ext.textstats import (
        build_bm25_index,
        bm25_index_search,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    idx = str(tmp_path / "bm25")
    build_bm25_index(docs, idx)
    out = bm25_index_search(spark, idx, ["spark"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    assert pf, plan[:2000]


# ----------------------------------------------------------------------
# PageRank
# ----------------------------------------------------------------------
def test_pagerank_matches_numpy_power_iteration(spark):
    from meteaudata_spark.ext.graph import pagerank

    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": ["a", "a", "b", "c", "d"],
                "dst": ["b", "c", "c", "a", "c"],
                "weight": [1.0, 2.0, 1.0, 1.0, 1.0],
            }
        )
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}

    # replica with the same nano-quantization at every step
    nodes = ["a", "b", "c", "d"]
    share = {("a", "b"): 1 / 3, ("a", "c"): 2 / 3, ("b", "c"): 1.0,
             ("c", "a"): 1.0, ("d", "c"): 1.0}
    import math

    Q = 1_000_000_000
    half_up = lambda x: math.floor(x + 0.5)  # Spark/DuckDB round, not banker's
    r = {n: half_up((1 / 4) * Q) / Q for n in nodes}
    for _ in range(5):
        innan = {n: 0 for n in nodes}
        for (s, d), sh in share.items():
            innan[d] += half_up(r[s] * sh * Q)
        r = {
            n: half_up((0.15 / 4 + 0.85 * (innan[n] / Q)) * Q) / Q
            for n in nodes
        }
    assert got == r
    # c has the most (and heaviest) in-links: it must dominate
    assert got["c"] == max(got.values())
    # d has no in-links: teleport-only rank
    assert abs(got["d"] - 0.15 / 4) < 1e-9


def test_pagerank_rejects_negative_iterations(spark):
    from meteaudata_spark.ext.graph import pagerank

    e = spark.createDataFrame(
        pd.DataFrame({"src": ["a"], "dst": ["b"], "weight": [1.0]})
    )
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)


# ----------------------------------------------------------------------
# SCD2 merge
# ----------------------------------------------------------------------
def test_scd2_merge_versions(spark):
    from meteaudata_spark.ext.relational import scd2_merge

    dim = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3], "city": ["a", "b", "c"], "tier": [1, 1, 2]}
        )
    )
    updates = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [2, 3, 4],
                "city": ["b", "c2", "d"],  # 2 unchanged, 3 changed, 4 new
                "tier": [1, 2, 3],
            }
        )
    )
    out = scd2_merge(dim, updates, ["k"], ["city", "tier"], "2024-06-01")
    rows = sorted(
        ((r["k"], r["city"], str(r["valid_from"]), r["valid_to"] and str(r["valid_to"]), r["is_current"]) for r in out.collect())
    )
    assert rows == [
        (1, "a", "1970-01-01", None, True),    # untouched
        (2, "b", "1970-01-01", None, True),    # update was a no-op
        (3, "c", "1970-01-01", "2024-06-01", False),  # closed out
        (3, "c2", "2024-06-01", None, True),   # new version
        (4, "d", "2024-06-01", None, True),    # brand-new key
    ]
    # exactly one current row per key
    cur = [r for r in rows if r[4]]
    assert len({r[0] for r in cur}) == len(cur) == 4


# ----------------------------------------------------------------------
# range join
# ----------------------------------------------------------------------
def test_range_join_matches_naive_between(spark):
    from meteaudata_spark.ext.rangejoin import range_join

    rng = np.random.default_rng(11)
    pts = spark.createDataFrame(
        pd.DataFrame({"pid": range(300), "ts": rng.integers(0, 100_000, 300)})
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": range(40),
                "start": (starts := rng.integers(0, 95_000, 40)),
                "end": starts + rng.integers(0, 20_000, 40),  # spans >> bucket
            }
        )
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pts, iv, ts_col="ts", start_col="start", end_col="end",
            bucket_seconds=1000,
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    )
    assert got == want and len(got) > 100


def test_range_join_left_keeps_unmatched_points(spark):
    from meteaudata_spark.ext.rangejoin import range_join

    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 2], "ts": [100, 999_999]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [7], "start": [50], "end": [150]})
    )
    rows = {r["pid"]: r for r in range_join(
        pts, iv, ts_col="ts", start_col="start", end_col="end", how="left"
    ).collect()}
    assert rows[1]["iid"] == 7
    assert rows[2]["iid"] is None


def test_range_join_rejects_bad_knobs(spark):
    from meteaudata_spark.ext.rangejoin import range_join

    d = spark.createDataFrame(pd.DataFrame({"ts": [1]}))
    i = spark.createDataFrame(pd.DataFrame({"start": [0], "end": [2]}))
    with pytest.raises(ValueError):
        range_join(d, i, how="outer")
    with pytest.raises(ValueError):
        range_join(d, i, bucket_seconds=0)


def test_range_join_left_null_point_columns_not_duplicated(spark):
    """Regression: a matched point carrying a NULL column must not ALSO
    surface as an unmatched row (the anti join must be null-safe)."""
    from meteaudata_spark.ext.rangejoin import range_join

    pts = spark.createDataFrame(
        pd.DataFrame({"pid": [1], "ts": [100], "tag": [None]}).astype(
            {"tag": "object"}
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [7], "start": [50], "end": [150]})
    )
    rows = range_join(
        pts, iv, ts_col="ts", start_col="start", end_col="end", how="left"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["iid"] == 7


def test_control_chart_flags_planted_excursions(spark, tmp_path):
    n = 300
    ts = pd.date_range("2024-01-01", freq="300s", periods=n)
    vals = np.ones(n)
    vals[50] = 50.0    # above UCL
    vals[120] = -50.0  # below LCL
    pd.DataFrame(
        {
            "event_id": range(n), "ts": ts, "user_id": 0,
            "event_type": "spc", "value": vals, "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    out = {r["status"]: r for r in tsq.ts_control_chart(spark, str(tmp_path)).collect()}
    assert out["above_ucl"]["n_buckets"] == 1
    assert out["below_lcl"]["n_buckets"] == 1
    assert out["in_control"]["n_buckets"] == n - 2
    assert out["in_control"]["lcl"] < 1.0 < out["in_control"]["ucl"]


def test_session_stats_hand_corpus(spark, tmp_path):
    """Two users, known session structure: user A has two sessions
    (3 events then a 40-min gap then 1 event); user B one 2-event
    session."""
    rows = [
        (0, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:10:00", 1),
        (2, "2024-01-01 00:20:00", 1),             # A session 1: 1200 s
        (3, "2024-01-01 01:00:00", 1),             # A session 2: single
        (4, "2024-01-01 00:00:00", 2), (5, "2024-01-01 00:05:00", 2),  # B: 300 s
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": "x",
            "value": 1.0,
            "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    r = tsq.ts_session_stats(spark, str(tmp_path)).collect()[0]
    assert r["n_sessions"] == 3
    assert abs(r["mean_duration_s"] - (1200 + 0 + 300) / 3) < 1e-6
    assert abs(r["mean_events_per_session"] - 2.0) < 1e-6
    assert abs(r["single_event_share"] - 1 / 3) < 1e-6


def test_lsh_multiprobe_recall_superset(spark):
    """Hamming-1 multi-probe must verify a SUPERSET of the
    single-probe pairs at identical planes/tables — and on a
    plane-heavy configuration (high precision, low recall) it
    recovers pairs single-probe misses."""
    rng = np.random.default_rng(13)
    base = rng.normal(size=(120, 64)).astype(np.float32)
    # plant 30 near-dup partners (small perturbations of the first 30)
    partners = base[:30] + 0.15 * rng.normal(size=(30, 64)).astype(np.float32)
    vecs = np.vstack([base, partners])
    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [v.tolist() for v in vecs],
                "label": 0,
            }
        )
    )
    kw = dict(threshold=0.6, n_tables=2, n_planes=12)
    single = {
        (r["vec_a"], r["vec_b"])
        for r in SS.lsh_near_pairs(d, **kw).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in SS.lsh_near_pairs(d, multiprobe=True, **kw).collect()
    }
    assert multi >= single
    # at 12 planes / 2 tables the exact-bucket recall is poor; the
    # Hamming-1 probes must strictly add verified pairs (seeded, so
    # this is deterministic)
    assert len(multi) > len(single), (len(single), len(multi))


def test_dedup_keep_best_picks_highest_quality(spark):
    """The survivor of each cluster must be its quality argmax (doc_id
    tiebreak), cross-checked against the cluster and quality tables."""
    from meteaudata_spark.ext import textstats
    from meteaudata_spark.ext.dedup import doc_dedup_clusters, doc_dedup_keep_best

    sf = "/root/testdata/sf0.001"
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in doc_dedup_clusters(spark, sf).collect()
    }
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in textstats.doc_quality_score(spark, sf).collect()
    }
    out = {r["cluster_id"]: r for r in doc_dedup_keep_best(spark, sf).collect()}
    assert len(out) > 0
    by_cluster = {}
    for doc, cl in clusters.items():
        by_cluster.setdefault(cl, []).append(doc)
    for cl, members in by_cluster.items():
        want = min(members, key=lambda d: (-quality[d], d))
        assert out[cl]["keep_doc_id"] == want
        assert out[cl]["cluster_size"] == len(members)
        assert out[cl]["n_dropped"] == len(members) - 1


def test_split_leakage_matrix_consistent_with_sources(spark):
    """Every reported leaking pair must be a real minhash pair whose
    members carry different split labels; totals must reconcile."""
    from meteaudata_spark.ext.corpus_ops import doc_hash_split, doc_split_leakage
    from meteaudata_spark.ext.dedup import doc_minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    splits = {r["doc_id"]: r["split"] for r in doc_hash_split(spark, sf).collect()}
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in doc_minhash_lsh_pairs(spark, sf).collect()
    ]
    expected = {}
    for a, b in pairs:
        if splits[a] != splits[b]:
            key = (splits[a], splits[b])
            expected[key] = expected.get(key, 0) + 1
    got = {
        (r["split_a"], r["split_b"]): r["n_leaking_pairs"]
        for r in doc_split_leakage(spark, sf).collect()
    }
    assert got == expected
    assert sum(got.values()) == sum(expected.values())


def test_forecast_eval_holt_beats_naive_on_ramp(spark, tmp_path):
    """On a linear ramp Holt's one-step forecast is near-perfect while
    the naive last-value forecast is off by one slope step every time:
    the MASE-style ratio must be well below 1."""
    n = 240
    ts = pd.date_range("2024-01-01", freq="300s", periods=n)
    vals = 10.0 + 0.5 * np.arange(n)
    pd.DataFrame(
        {
            "event_id": range(n), "ts": ts, "user_id": 0,
            "event_type": "ramp", "value": vals, "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    r = tsq.ts_forecast_eval(spark, str(tmp_path)).collect()[0]
    assert r["n_forecasts"] == n - 1
    assert r["mase_ratio"] < 0.5, r


def test_weekly_profile_dow_arithmetic(spark, tmp_path):
    """1970-01-01 is a Thursday: epoch 0 must land in dow=4, and a
    +3-day shift in dow=0 (Sunday)."""
    ts = pd.to_datetime(["1970-01-01 05:00:00", "1970-01-04 23:00:00"])
    pd.DataFrame(
        {
            "event_id": [0, 1], "ts": ts, "user_id": 0,
            "event_type": "w", "value": [1.0, 2.0], "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    rows = {(r["dow"], r["hour"]): r for r in tsq.ts_weekly_profile(spark, str(tmp_path)).collect()}
    assert (4, 5) in rows and rows[(4, 5)]["mean_value"] == 1.0   # Thursday
    assert (0, 23) in rows and rows[(0, 23)]["mean_value"] == 2.0  # Sunday


def test_ngram_novelty_first_doc_fully_novel(spark, tmp_path):
    texts = [
        "a b c d e",            # doc 0: all 3 grams novel
        "a b c x y z",          # doc 1: shares 'a b c' with doc 0
        "a b c d e",            # doc 2: exact repeat -> zero novelty
    ]
    pd.DataFrame(
        {
            "doc_id": range(3), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.textstats import doc_ngram_novelty

    out = {r["doc_id"]: r for r in doc_ngram_novelty(spark, str(tmp_path)).collect()}
    assert out[0]["n_novel"] == out[0]["n_grams"] == 3
    assert out[1]["n_grams"] == 4 and out[1]["n_novel"] == 3  # 'a b c' seen
    assert out[2]["n_novel"] == 0 and out[2]["novelty_micros"] == 0


def test_ngram_novelty_short_docs_yield_no_grams(spark, tmp_path):
    """Docs with fewer than n words must be DROPPED, not crash:
    sequence(1, size-2) in Spark is a descending [1, 0] when the bound
    is 0 and the resulting slice(words, 0, 3) throws — the CASE guard
    gates them to an empty gram array, matching DuckDB's empty
    range(1, ...)."""
    texts = ["solo", "two words", "a b c d"]  # only doc 2 has 3-grams
    pd.DataFrame(
        {
            "doc_id": range(3), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.textstats import doc_ngram_novelty

    out = {r["doc_id"]: r for r in doc_ngram_novelty(spark, str(tmp_path)).collect()}
    assert set(out) == {2}
    assert out[2]["n_grams"] == out[2]["n_novel"] == 2


def test_ngram_novelty_oracle_agrees_on_short_docs(spark, tmp_path):
    """Differential: Spark and the DuckDB oracle produce identical rows
    on a corpus containing sub-n-gram documents."""
    import duckdb

    texts = ["x", "p q", "a b c d e", "a b c", "q"]
    pd.DataFrame(
        {
            "doc_id": range(5), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.textstats import (
        DOC_NGRAM_NOVELTY_SQL,
        doc_ngram_novelty,
    )

    got = (
        doc_ngram_novelty(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = con.execute(DOC_NGRAM_NOVELTY_SQL).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist() == [2, 3]
    for c in ("n_grams", "n_novel", "novelty_micros"):
        assert got[c].tolist() == want[c].astype(int).tolist(), c


def test_weekly_profile_oracle_agrees_pre_epoch(spark, tmp_path):
    """Pre-1970 timestamps have NEGATIVE epochs: Spark's pmod is always
    non-negative, so the SQL oracle must mirror it with the
    ((x % m) + m) % m form or the engines diverge on historical data."""
    import duckdb

    ts = pd.to_datetime(
        ["1969-12-30 22:00:00", "1969-12-31 05:00:00", "1970-01-02 07:00:00"]
    )
    pd.DataFrame(
        {
            "event_id": range(3), "ts": ts, "user_id": 0,
            "event_type": "w", "value": [1.0, 2.0, 3.0], "props": "{}",
        }
    ).to_parquet(tmp_path / "events.parquet")
    got = (
        tsq.ts_weekly_profile(spark, str(tmp_path))
        .toPandas()
        .sort_values(["event_type", "dow", "hour"])
        .reset_index(drop=True)
    )
    assert (got["dow"] >= 0).all() and (got["hour"] >= 0).all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = con.execute(tsq.TS_WEEKLY_PROFILE_SQL).df()
    assert got["dow"].tolist() == want["dow"].astype(int).tolist()
    assert got["hour"].tolist() == want["hour"].astype(int).tolist()
    assert got["mean_value"].tolist() == want["mean_value"].tolist()


def _write_star_fixture(tmp_path):
    """Tiny star schema exercising the Q2/Q11/Q16/Q20 analog shapes."""
    pd.DataFrame({"r_regionkey": [0, 1], "r_name": ["AFRICA", "EUROPE"]}).to_parquet(
        tmp_path / "region.parquet"
    )
    pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["N0", "N1"], "n_regionkey": [0, 1]}
    ).to_parquet(tmp_path / "nation.parquet")
    pd.DataFrame(
        {
            "s_suppkey": [1, 2, 3],
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": [1, 1, 0],
            "s_acctbal": [100.0, -5.0, 50.0],
        }
    ).to_parquet(tmp_path / "supplier.parquet")
    pd.DataFrame(
        {
            "p_partkey": [10, 11],
            "p_name": ["small ring", "red bolt"],
            "p_brand": ["Brand#2", "Brand#3"],
            "p_type": ["STANDARD", "PROMO"],
            "p_size": [4, 9],
            "p_retailprice": [10.0, 20.0],
        }
    ).to_parquet(tmp_path / "part.parquet")
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_partkey": [10, 10, 10, 11],
            "l_suppkey": [1, 2, 3, 1],
            "l_linenumber": [1, 2, 1, 1],
            "l_quantity": [5.0, 30.0, 2.0, 1.0],
            "l_extendedprice": [100.0, 80.0, 120.0, 40.0],
            "l_discount": [0.0, 0.0, 0.0, 0.0],
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pd.to_datetime(["1995-01-01"] * 4),
        }
    ).to_parquet(tmp_path / "lineitem.parquet")


def test_q2_min_cost_supplier_keeps_all_regional_minima(spark, tmp_path):
    _write_star_fixture(tmp_path)
    rows = relational.q2_min_cost_supplier(spark, str(tmp_path)).collect()
    # part 10 (STANDARD, size 4): EUROPE suppliers are 1 (min price 100)
    # and 2 (min price 80) -> supplier 2 holds the regional min; part 11
    # is PROMO and excluded
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_partkey"], r["s_suppkey"], r["supply_cost"]) == (10, 2, 80.0)


def test_q11_important_parts_mean_relative_threshold(spark, tmp_path):
    _write_star_fixture(tmp_path)
    # AFRICA (region 0) suppliers: only supplier 3 -> part 10 value
    # 120*2 = 240; a single part can't exceed 2x the mean of itself
    rows = relational.q11_important_parts(spark, str(tmp_path)).collect()
    assert rows == []


def test_q16_excludes_negative_balance_suppliers(spark, tmp_path):
    _write_star_fixture(tmp_path)
    rows = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in relational.q16_supplier_part_counts(spark, str(tmp_path)).collect()
    }
    # part 10: suppliers {1, 2, 3} minus supplier 2 (negative balance) = 2;
    # part 11 is PROMO -> excluded
    assert rows == {("Brand#2", "STANDARD", 4): 2}


def test_q20_volume_threshold_semi_join(spark, tmp_path):
    _write_star_fixture(tmp_path)
    rows = {r["s_suppkey"] for r in relational.q20_potential_promotions(spark, str(tmp_path)).collect()}
    # 'small%' part 10 pairs: (s1, 35? no: s1 has qty 5), (s2, 30), (s3, 2)
    # total 37, n_pairs 3 -> threshold qty*3 > 1.25*37=46.25 -> s2 (90) only
    assert rows == {2}


def test_substring_spans_detects_and_merges(spark, tmp_path):
    """ExactSubstr-style span semantics: a doc that copies an earlier
    doc's 10-word run reports ONE merged span (the three overlapping
    8-gram hits coalesce), within-doc repetition counts as duplicate,
    and clean/short docs report zeros."""
    base_words = [f"w{i}" for i in range(30)]
    copied = " ".join(base_words[5:15])  # 10-word run from doc 0
    texts = [
        " ".join(base_words),                      # doc 0: source
        "unique opening words here " + copied,     # doc 1: one copied run
        "all fresh content " + " ".join(f"x{i}" for i in range(20)),  # doc 2
        "tiny doc",                                # doc 3: < 8 words
        " ".join(f"r{i % 8}" for i in range(32)),  # doc 4: self-repeating
    ]
    pd.DataFrame(
        {
            "doc_id": range(5), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.dedup import doc_substring_spans

    out = {r["doc_id"]: r for r in doc_substring_spans(spark, str(tmp_path)).collect()}
    assert len(out) == 5
    # doc 0 is the first occurrence of everything it contains
    assert out[0]["n_dup_spans"] == 0 and out[0]["dup_words"] == 0
    # doc 1: grams at positions 5,6,7 (the 10-word copy) merge to ONE
    # span covering exactly those 10 words
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_words"] == 10
    # clean + short docs: zeros
    assert out[2]["dup_words"] == 0 and out[3]["dup_words"] == 0
    # doc 4 repeats an 8-word period: grams at positions 1..8 are each
    # phase's first occurrence, every later gram (9..25) duplicates an
    # earlier position IN THE SAME DOC -> one span covering words 9..32
    assert out[4]["n_dup_spans"] == 1
    assert out[4]["dup_words"] == 24


def test_substring_spans_oracle_agrees(spark, tmp_path):
    import duckdb

    texts = [
        " ".join(f"a{i}" for i in range(20)),
        "zz " + " ".join(f"a{i}" for i in range(8)) + " qq "
        + " ".join(f"a{i}" for i in range(10, 18)),
        "short one",
    ]
    pd.DataFrame(
        {
            "doc_id": range(3), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.dedup import (
        DOC_SUBSTRING_SPANS_SQL,
        doc_substring_spans,
    )

    got = (
        doc_substring_spans(spark, str(tmp_path))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = con.execute(DOC_SUBSTRING_SPANS_SQL).df()
    for c in ("doc_id", "n_words", "n_dup_spans", "dup_words", "dup_micros"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c


def test_substring_scrub_removes_exactly_the_spans(spark, tmp_path):
    """The scrub action drops precisely the words doc_substring_spans
    reports (dup_words == n_dropped) and leaves clean docs
    character-exact."""
    base_words = [f"w{i}" for i in range(30)]
    copied = " ".join(base_words[5:15])
    texts = [
        " ".join(base_words),
        "unique opening words here " + copied + " trailing bits",
        "fresh " + " ".join(f"x{i}" for i in range(12)),
    ]
    pd.DataFrame(
        {
            "doc_id": range(3), "text": texts, "lang": "en",
            "source": "t", "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.dedup import (
        doc_substring_spans,
        substring_scrub,
    )

    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    spans = {r["doc_id"]: r for r in doc_substring_spans(spark, str(tmp_path)).collect()}
    out = {r["doc_id"]: r for r in substring_scrub(d).collect()}
    for i in range(3):
        assert out[i]["n_dropped"] == spans[i]["dup_words"], i
    # doc 0 and 2 are untouched
    assert out[0]["scrubbed_text"] == texts[0]
    assert out[2]["scrubbed_text"] == texts[2]
    # doc 1 loses exactly the copied 10-word run
    expect = "unique opening words here trailing bits"
    assert out[1]["scrubbed_text"] == expect


def test_substring_spans_wide_doc_ids_exact(spark, tmp_path):
    """Round-8 struct-key regression (dedup.py MIN(struct(doc_id,pos))):
    the retired packed key ``doc_id*1048576 + pos`` wraps mod 2^64 for
    doc_ids >= 2^43 — ids 2^43 and 3*2^43 with the same gram position
    packed to the SAME key (2^63+1 wraps to -2^63+1 for both), so the
    ``key <> first_key`` filter flagged NEITHER occurrence and the
    later doc wrongly reported zero duplication (or errored under ANSI
    arithmetic).  The struct key is exact at any id width."""
    import duckdb

    shared = " ".join(f"s{i}" for i in range(8))
    lo, hi = 1 << 43, 3 * (1 << 43)
    texts = [
        shared + " " + " ".join(f"ua{i}" for i in range(6)),
        shared + " " + " ".join(f"ub{i}" for i in range(6)),
    ]
    pd.DataFrame(
        {
            "doc_id": pd.array([lo, hi], dtype="int64"),
            "text": texts, "lang": "en", "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from meteaudata_spark.ext.dedup import (
        DOC_SUBSTRING_SPANS_SQL,
        doc_substring_spans,
    )

    out = {r["doc_id"]: r for r in doc_substring_spans(spark, str(tmp_path)).collect()}
    # the lexicographically smaller (doc_id, pos) is the first
    # occurrence; the wide-id later doc must report the 8-word span
    assert out[lo]["n_dup_spans"] == 0 and out[lo]["dup_words"] == 0
    assert out[hi]["n_dup_spans"] == 1 and out[hi]["dup_words"] == 8
    # and the DuckDB oracle twin (struct_pack min, same round's fix)
    # agrees at these ids — the packed-BIGINT twin overflowed here
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = con.execute(DOC_SUBSTRING_SPANS_SQL).df()
    got = (
        doc_substring_spans(spark, str(tmp_path))
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = want.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_words", "n_dup_spans", "dup_words", "dup_micros"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
