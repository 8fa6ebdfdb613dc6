"""Round-9 additions: multi-signal consensus dedup and MinHash
signature calibration."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _cold_caches():
    from meteaudata_spark.plans.opcache import release_operator_caches

    release_operator_caches()
    yield
    release_operator_caches()


# ----------------------------------------------------------------------
# doc_dedup_consensus
# ----------------------------------------------------------------------
def _pairs(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def test_consensus_counts_signals_and_filters(spark):
    """Signal counting over planted pair lists: a pair needs >=2
    non-null signals to survive; columns a detector did not flag
    stay null."""
    from meteaudata_spark.ext.dedup import doc_dedup_consensus

    mh = _pairs(spark, [(1, 2, 0.8), (3, 4, 0.5)], ["doc_a", "doc_b", "jaccard"])
    sh = _pairs(spark, [(1, 2, 1), (5, 6, 2)], ["doc_a", "doc_b", "hamming"])
    em = _pairs(spark, [(5, 6, 0.9), (7, 8, 0.95)], ["vec_a", "vec_b", "cosine"])
    out = (
        doc_dedup_consensus(
            spark,
            SF,
            minhash_pairs=mh,
            simhash_pairs=sh,
            embedding_pairs=em,
        )
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    # (1,2): minhash+simhash; (5,6): simhash+embedding; singletons dropped
    assert list(map(tuple, out[["doc_a", "doc_b"]].values)) == [(1, 2), (5, 6)]
    assert out.n_signals.tolist() == [2, 2]
    r12 = out.iloc[0]
    assert r12.jaccard == 0.8 and r12.hamming == 1 and pd.isna(r12.cosine)
    r56 = out.iloc[1]
    assert pd.isna(r56.jaccard) and r56.hamming == 2 and r56.cosine == 0.9


def test_consensus_min_signals_three(spark):
    from meteaudata_spark.ext.dedup import doc_dedup_consensus

    mh = _pairs(spark, [(1, 2, 0.8)], ["doc_a", "doc_b", "jaccard"])
    sh = _pairs(spark, [(1, 2, 1), (5, 6, 2)], ["doc_a", "doc_b", "hamming"])
    em = _pairs(spark, [(1, 2, 0.9), (5, 6, 0.9)], ["vec_a", "vec_b", "cosine"])
    out = doc_dedup_consensus(
        spark,
        SF,
        min_signals=3,
        minhash_pairs=mh,
        simhash_pairs=sh,
        embedding_pairs=em,
    ).toPandas()
    assert list(map(tuple, out[["doc_a", "doc_b"]].values)) == [(1, 2)]


def test_consensus_pairs_flagged_by_source_miners(spark):
    """Integration at sf0.001: every consensus pair is present in at
    least two of the three per-signal miners' outputs (the default
    path composes the memoized relations)."""
    from meteaudata_spark.ext import dedup, simsearch

    out = dedup.doc_dedup_consensus(spark, SF).toPandas()
    assert len(out) > 0
    mh = {
        tuple(r)
        for r in dedup.doc_minhash_lsh_pairs(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    }
    sh = {
        tuple(r)
        for r in dedup.doc_simhash_near_pairs(spark, SF)
        .select("doc_a", "doc_b")
        .collect()
    }
    em = {
        tuple(r)
        for r in simsearch.emb_lsh_near_pairs(spark, SF, threshold=0.4)
        .select("vec_a", "vec_b")
        .collect()
    }
    for _, r in out.iterrows():
        p = (r.doc_a, r.doc_b)
        n = (p in mh) + (p in sh) + (p in em)
        assert n >= 2 and n == r.n_signals


# ----------------------------------------------------------------------
# doc_minhash_calibration
# ----------------------------------------------------------------------
def test_calibration_identical_docs_are_exact(spark):
    """Two identical docs: signature agreement 32/32, exact Jaccard
    1.0, error 0 — the calibration arithmetic's fixed point."""
    from meteaudata_spark.ext.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    d = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta gamma delta epsilon zeta"] * 2,
            }
        )
    )
    pairs = minhash_lsh_pairs(d).toPandas()
    assert len(pairs) == 1 and pairs.jaccard.iloc[0] == 1.0
    sigs = minhash_signatures(d).toPandas()
    a = sigs[sigs.doc_id == 1].iloc[0]
    b = sigs[sigs.doc_id == 2].iloc[0]
    assert all(a[f"mh_{j}"] == b[f"mh_{j}"] for j in range(32))


def test_calibration_arithmetic_consistent(spark):
    """At sf0.001: est = round(n_match/32 * 1e6), err = |est - exact|,
    and every mined pair appears exactly once."""
    from meteaudata_spark.ext import dedup

    cal = dedup.doc_minhash_calibration(spark, SF).toPandas()
    pairs = dedup.doc_minhash_lsh_pairs(spark, SF).toPandas()
    assert len(cal) == len(pairs) > 0
    assert (cal.n_match.between(0, 32)).all()
    est = (cal.n_match * 1_000_000.0 / 32).round().astype("int64")
    assert (cal.est_micros == est).all()
    assert (cal.err_micros == (cal.est_micros - cal.exact_micros).abs()).all()


def test_calibration_reuses_memoized_upstreams(spark):
    """Second call re-reads the memoized pair list and signature
    relation — no new memo entries, no re-mining."""
    from meteaudata_spark.ext import dedup
    from meteaudata_spark.plans import opcache

    dedup.doc_minhash_calibration(spark, SF).count()
    n_memo = len(opcache._memo)
    dedup.doc_minhash_calibration(spark, SF).count()
    assert len(opcache._memo) == n_memo


# ----------------------------------------------------------------------
# mm_audio_vad
# ----------------------------------------------------------------------
def test_audio_segments_vad_planted(spark):
    """Hand-built WAV with known loud/quiet spans → exact segment
    table, including the silence-threshold boundary (|byte-128|=63
    is silence, 64 is speech at the 500k-micro fence)."""
    import numpy as np
    import pandas as pd
    from meteaudata_spark.ext.multimodal import audio_segments, encode_wav

    # bytes: 4 speech, 4 silence, 8 speech; boundary values 191 (=128+63,
    # silence) and 192 (=128+64, speech)
    bytes_ = [255, 255, 192, 192, 191, 191, 65, 128, 0, 0, 0, 0, 255, 255, 255, 255]
    vals = ((np.array(bytes_, dtype=np.int64) - 128) * 256).astype(np.int16)
    payload = encode_wav(np.repeat(vals, 200), 8000)
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [payload]})
    )
    out = audio_segments(
        assets, frame_ms=25, hop_ms=25, silence_rms_micros=500_000
    ).toPandas()
    got = list(
        map(tuple, out[["segment_no", "state", "start_ms", "end_ms", "n_frames"]].values)
    )
    assert got == [
        (1, "speech", 0, 100, 4),
        (2, "silence", 100, 200, 4),
        (3, "speech", 200, 400, 8),
    ]


def test_mm_audio_vad_frame_count(spark):
    """Every asset frames to exactly 16 segments-worth of frames
    (Σ n_frames = 16) and ms spans tile [0, 400] without gaps."""
    from meteaudata_spark.ext import multimodal as mm

    out = mm.mm_audio_vad(spark, SF).toPandas()
    per = out.groupby("asset_id")
    assert (per.n_frames.sum() == 16).all()
    assert (per.start_ms.min() == 0).all()
    assert (per.end_ms.max() == 400).all()
    # segments within an asset are contiguous
    for _, g in out.groupby("asset_id"):
        g = g.sort_values("segment_no")
        assert (g.end_ms.values[:-1] == g.start_ms.values[1:]).all()


# ----------------------------------------------------------------------
# doc_url_dedup
# ----------------------------------------------------------------------
def test_url_dedup_normalization_invariants(spark):
    """Every normalized URL is lowercase with no fragment, no utm
    query string, and no trailing slash; doc counts are conserved."""
    from meteaudata_spark.ext.dedup import doc_url_dedup

    out = doc_url_dedup(spark, SF).toPandas()
    assert (out.norm_url == out.norm_url.str.lower()).all()
    assert not out.norm_url.str.contains("#").any()
    assert not out.norm_url.str.contains("?", regex=False).any()
    assert not out.norm_url.str.endswith("/").any()
    n_docs_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.n_docs.sum() == n_docs_total
    assert (out.n_removed == out.n_docs - 1).all()
    # the 4 recorded variants of one page must collapse: with >=200
    # docs over 350 canonical pages, duplicates must exist
    assert (out.n_docs >= 2).any()


def test_url_dedup_variants_collapse_and_keeper_is_min(spark):
    """doc_ids 0, 350, 700, 1050 are the four variants (lower, slash,
    utm, fragment) of the SAME canonical page (same id mod 7, mod 50)
    — at a SF with >=1051 docs they normalize identically.  At this SF
    check the deterministic doc_id 0 row directly."""
    from meteaudata_spark.ext.dedup import doc_url_dedup

    out = doc_url_dedup(spark, SF).toPandas().set_index("norm_url", drop=False)
    row = out.loc["https://site0.example.org/page/0"]
    # keeper is the smallest doc_id of the group; doc 0 belongs to it
    assert row.kept_doc_id == 0
    # every group's keeper participates in the group size accounting
    assert (out.n_docs >= 1).all()


def test_url_dedup_strips_only_utm_query(spark):
    """The decoration only ever appends utm_* query strings, so no
    normalized URL retains a query; path segments with digits (the
    page number) survive normalization."""
    from meteaudata_spark.ext.dedup import doc_url_dedup

    out = doc_url_dedup(spark, SF).toPandas()
    assert out.norm_url.str.match(
        r"https://site[0-6]\.example\.org/page/\d+$"
    ).all()


# ----------------------------------------------------------------------
# doc_lexicon_filter
# ----------------------------------------------------------------------
def test_lexicon_filter_counts_and_fence(spark):
    """flagged counts match a pandas recount on the raw text; the
    verdict is exactly the 10% integer-floor fence; both verdicts
    occur at this SF."""
    from meteaudata_spark.ext.textstats import (
        _FILTER_LEXICON,
        _LEXICON_KEEP_MICROS,
        doc_lexicon_filter,
    )

    out = doc_lexicon_filter(spark, SF).toPandas().set_index("doc_id")
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )
    lex = set(_FILTER_LEXICON)
    for doc_id, text in docs.text.head(50).items():
        toks = text.split(" ")
        n_flagged = sum(1 for t in toks if t in lex)
        row = out.loc[doc_id]
        assert row.n_tokens == len(toks)
        assert row.n_flagged == n_flagged
        assert row.flagged_ratio_micros == n_flagged * 1_000_000 // len(toks)
    assert (
        (out.flagged_ratio_micros <= _LEXICON_KEEP_MICROS)
        == (out.verdict == "keep")
    ).all()
    assert set(out.verdict.unique()) == {"keep", "drop"}


# ----------------------------------------------------------------------
# doc_perplexity_buckets
# ----------------------------------------------------------------------
def test_perplexity_buckets_partition_each_lang_into_thirds(spark):
    """Per lang: buckets are 0/1/2 with matching labels, score ranges
    are disjoint and ascending (tail < middle < head), doc counts sum
    to the number of scored (>=2-token) docs, and each bucket holds
    roughly a third (exact thirds up to score-value ties)."""
    from meteaudata_spark.ext.textstats import (
        doc_bigram_likelihood,
        doc_perplexity_buckets,
    )

    out = doc_perplexity_buckets(spark, SF).toPandas()
    assert set(out.bucket.unique()) <= {0, 1, 2}
    label_of = {0: "tail", 1: "middle", 2: "head"}
    assert (out.bucket_label == out.bucket.map(label_of)).all()

    scored = doc_bigram_likelihood(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    per_lang = (
        scored.join(docs, "doc_id")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    for lang, grp in out.groupby("lang"):
        grp = grp.sort_values("bucket")
        assert grp.n_docs.sum() == per_lang[lang]
        # disjoint ascending score ranges: a score value maps to ONE bucket
        for (_, lo), (_, hi) in zip(grp.iterrows(), grp.iloc[1:].iterrows()):
            assert lo.max_score_micros < hi.min_score_micros
        # thirds up to ties: no bucket may be empty while another
        # holds everything
        assert grp.n_docs.max() <= per_lang[lang] - 2 * grp.n_docs.min() + per_lang[lang] // 3


def test_perplexity_buckets_tied_scores_share_bucket(spark):
    """The bucket key is the SCORE VALUE (histogram), not the doc: any
    two docs with equal micro-quantized scores must land in the same
    bucket — re-derive the bucket map and check it is a function of
    smicros."""
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.textstats import doc_bigram_likelihood

    scored = (
        doc_bigram_likelihood(spark, SF)
        .select(
            "doc_id",
            F.round(F.col("avg_bigram_prob") * 1e6)
            .cast("bigint")
            .alias("smicros"),
        )
        .toPandas()
    )
    # histogram bucketing: cum_lt // n per score value — deterministic
    # function of the value by construction; assert the planted
    # boundary property on the recomputation
    import numpy as np

    vals = np.sort(scored.smicros.values)
    n = len(vals)
    uniq, counts = np.unique(vals, return_counts=True)
    cum_lt = np.concatenate([[0], np.cumsum(counts)[:-1]])
    bucket = (cum_lt * 3) // n
    assert bucket.min() == 0 and bucket.max() <= 2
    assert (np.diff(bucket) >= 0).all()


# ----------------------------------------------------------------------
# emb_bq_topk
# ----------------------------------------------------------------------
def test_bq_codes_pack_sign_bits(spark):
    """Planted vectors: bit i of (lo ‖ hi) ⇔ dim i > 0; identical
    vectors get identical codes (Hamming 0); a one-dim flip moves
    exactly one bit."""
    import pandas as pd

    from meteaudata_spark.ext.simsearch import emb_bq_codes

    v = [0.5] * 64                      # all positive → all bits set
    w = list(v); w[3] = -0.1            # flip bit 3 (lo word)
    x = list(v); x[40] = 0.0            # flip bit 40 (hi word; 0 is NOT > 0)
    pdf = pd.DataFrame({"vec_id": [1, 2, 3, 4], "embedding": [v, v, w, x]})
    out = (
        emb_bq_codes(spark.createDataFrame(pdf))
        .orderBy("vec_id")
        .toPandas()
    )
    full = (1 << 32) - 1
    assert out.bq_lo.tolist() == [full, full, full ^ (1 << 3), full]
    assert out.bq_hi.tolist() == [full, full, full, full ^ (1 << 8)]
    # identical vectors: hamming 0
    assert (out.bq_lo[0], out.bq_hi[0]) == (out.bq_lo[1], out.bq_hi[1])


def test_bq_topk_contract_and_recall(spark):
    """Every query returns exactly k rows ranked by reranked cosine;
    all survivors respect the Hamming fence; recall@5 vs the exact
    brute-force top-k clears the 1-bit/dim floor on the gate corpus."""
    from meteaudata_spark.ext.simsearch import emb_bq_topk, emb_cosine_topk

    bq = emb_bq_topk(spark, SF).toPandas()
    assert (bq.groupby("query_id").size() == 5).all()
    assert (bq.hamming <= 28).all()
    for _, grp in bq.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert (grp.cosine.diff().dropna() <= 1e-12).all()
    ex = emb_cosine_topk(spark, SF).toPandas()
    recalls = []
    for q in ex.query_id.unique():
        e = set(ex[ex.query_id == q].vec_id)
        recalls.append(len(e & set(bq[bq.query_id == q].vec_id)) / len(e))
    assert sum(recalls) / len(recalls) >= 0.3, recalls


# ----------------------------------------------------------------------
# doc_dedup_cascade
# ----------------------------------------------------------------------
def test_cascade_funnel_is_monotone_and_chained(spark):
    """Stages chain (stage k's n_out is stage k+1's n_in), counts
    never grow, stage 1 starts at the full corpus, and n_removed is
    the difference."""
    from meteaudata_spark.ext.dedup import doc_dedup_cascade

    out = doc_dedup_cascade(spark, SF).toPandas()
    assert out.stage.tolist() == ["1_url", "2_exact", "3_neardup"]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.n_in.iloc[0] == n_docs
    assert (out.n_out <= out.n_in).all()
    assert (out.n_removed == out.n_in - out.n_out).all()
    assert out.n_in.iloc[1] == out.n_out.iloc[0]
    assert out.n_in.iloc[2] == out.n_out.iloc[1]
    # the synthetic URL decoration guarantees stage-1 removals
    assert out.n_removed.iloc[0] > 0


def test_cascade_planted_single_cluster_keeps_one(spark):
    """clusters param: with EVERY doc in one near-dup cluster, stage 3
    must keep exactly one survivor (the lowest surviving doc_id) —
    pinning that the keeper is recomputed over stage-2 survivors."""
    from meteaudata_spark.ext.dedup import doc_dedup_cascade

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    one_cluster = docs.withColumn("cluster_id", F.lit(0))
    out = doc_dedup_cascade(spark, SF, clusters=one_cluster).toPandas()
    assert out.n_out.iloc[2] == 1


def test_cascade_empty_clusters_pass_through(spark):
    """clusters param: an empty cluster relation means stage 3 removes
    nothing — every stage-2 survivor passes."""
    from meteaudata_spark.ext.dedup import doc_dedup_cascade

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    empty = docs.withColumn("cluster_id", F.lit(0)).filter(F.lit(False))
    out = doc_dedup_cascade(spark, SF, clusters=empty).toPandas()
    assert out.n_removed.iloc[2] == 0
    assert out.n_out.iloc[2] == out.n_in.iloc[2]


def test_cascade_default_equals_precomputed(spark):
    """Passing the memoized clusters relation explicitly returns the
    identical table (compose-don't-recompute contract)."""
    from meteaudata_spark.ext.dedup import doc_dedup_cascade, doc_dedup_clusters

    default = doc_dedup_cascade(spark, SF).toPandas()
    pre = doc_dedup_cascade(
        spark, SF, clusters=doc_dedup_clusters(spark, SF)
    ).toPandas()
    pd.testing.assert_frame_equal(default, pre)


def test_normalize_url_idempotent_and_reference_cases(spark):
    """normalize(normalize(x)) == normalize(x) over generated URL
    shapes (host case × path × optional utm query × optional fragment
    × optional trailing slash), driven through the REAL Spark
    expression in one batch; plus pinned reference cases."""
    import itertools

    from meteaudata_spark.ext.dedup import normalize_url

    hosts = ["ex.COM", "sub.ex.org"]
    paths = ["", "/a", "/a/b9"]
    queries = ["", "?utm_source=x", "?utm_campaign=a&utm_medium=b"]
    frags = ["", "#f", "#a-b_c"]
    slashes = ["", "/"]
    urls = [
        f"https://{h}{p}{s}{q}{f}"
        for h, p, q, f, s in itertools.product(
            hosts, paths, queries, frags, slashes
        )
    ]
    pdf = pd.DataFrame({"url": urls})
    df = spark.createDataFrame(pdf)
    once = normalize_url(F.col("url"))
    out = df.select(
        once.alias("n1"), normalize_url(once).alias("n2")
    ).toPandas()
    assert (out.n1 == out.n2).all()
    # pinned reference forms
    ref = {
        "https://EX.com/A/": "https://ex.com/a",
        "https://ex.com/a?utm_source=x": "https://ex.com/a",
        "https://ex.com/a#frag": "https://ex.com/a",
        "https://ex.com": "https://ex.com",
    }
    got = (
        spark.createDataFrame(pd.DataFrame({"url": list(ref)}))
        .select("url", normalize_url(F.col("url")).alias("n"))
        .toPandas()
        .set_index("url")
        .n.to_dict()
    )
    assert got == ref


# ----------------------------------------------------------------------
# mm_audio_features
# ----------------------------------------------------------------------
def test_audio_features_planted_constant_frames(spark):
    """Hand-built digest-style WAV: rms/peak/zcr come out exactly as
    the integer formulas predict, including (a) numpy's int16 abs
    overflow (byte 0 → −32768 can never win the peak max) and (b)
    Python's round-HALF-EVEN on the odd-crossing-count ZCR."""
    import numpy as np

    from meteaudata_spark.ext.multimodal import audio_features, encode_wav

    # bytes: one zero byte (true |sample| 32768, int16 abs −32768),
    # crossing pattern with an ODD number of sign flips (3: at
    # boundaries 0→200, 129→0... count below)
    bytes_ = [0, 200, 200, 200, 100, 100, 100, 100, 100, 100, 100, 100, 100, 100, 100, 200]
    # signs (<128): [T,F,F,F,T,T,T,T,T,T,T,T,T,T,T,F] → flips at 0-1, 3-4, 14-15 → cnt=3
    vals = ((np.array(bytes_, dtype=np.int64) - 128) * 256).astype(np.int16)
    payload = encode_wav(np.repeat(vals, 200), 8000)
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [1], "payload": [payload]})
    )
    out = audio_features(assets, frame_ms=25, hop_ms=25).toPandas().iloc[0]
    assert (out.sample_rate, out.n_samples, out.duration_ms, out.n_frames) == (
        8000, 3200, 400, 16,
    )
    s_abs = sum(32768 if b == 0 else abs(b - 128) * 256 for b in bytes_)
    assert out.rms_micros == round(s_abs / 16 / 32767 * 1_000_000)
    # peak: true max |sample| is 32768 (byte 0) but int16 abs overflows
    # to −32768, so the winner is byte 200 → 72*256
    assert out.peak == 72 * 256
    # zcr: cnt=3 → 3/3200 * 1e6 = 937.5 → Python half-even → 938
    assert out.zcr_micros == 938
    # and a half-even case that rounds DOWN: cnt=1 → 312.5 → 312
    bytes2 = [100] * 15 + [200]
    vals2 = ((np.array(bytes2, dtype=np.int64) - 128) * 256).astype(np.int16)
    a2 = spark.createDataFrame(
        pd.DataFrame({"asset_id": [2], "payload": [encode_wav(np.repeat(vals2, 200), 8000)]})
    )
    out2 = audio_features(a2, frame_ms=25, hop_ms=25).toPandas().iloc[0]
    assert out2.zcr_micros == 312


def test_mm_audio_features_matches_vad_silence_logic(spark):
    """Cross-row consistency on the shared digest assets: an asset
    whose VAD table is all-silence must have rms_micros below the
    500k fence; an all-speech asset must sit above it."""
    from meteaudata_spark.ext import multimodal as mm

    feats = mm.mm_audio_features(spark, SF).toPandas().set_index("asset_id")
    vad = mm.mm_audio_vad(spark, SF).toPandas()
    per = vad.groupby("asset_id").state.agg(set)
    all_silence = per[per == {"silence"}].index
    all_speech = per[per == {"speech"}].index
    if len(all_silence):
        assert (feats.loc[all_silence].rms_micros < 500_000).all()
    if len(all_speech):
        assert (feats.loc[all_speech].rms_micros >= 500_000).all()


# ----------------------------------------------------------------------
# ts_asof_tolerance / emb_doc_coverage
# ----------------------------------------------------------------------
def test_asof_tolerance_gates_the_backward_match(spark):
    """Cross-row consistency with ts_asof_last_order: where the
    ungated as-of date is within tolerance the tolerance row must carry
    exactly that date; where it is older (or absent) the tolerance row
    must be null/unmatched — and both cases must occur at this SF."""
    from meteaudata_spark.ext import timeseries_queries as tsq

    tol = (
        tsq.ts_asof_tolerance(spark, SF).toPandas().set_index("event_id")
    )
    base = (
        tsq.ts_asof_last_order(spark, SF).toPandas().set_index("event_id")
    )
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "ts")
        .toPandas()
        .set_index("event_id")
    )
    joined = tol.join(base.last_order_date).join(ev.ts)
    days = (
        joined.ts.dt.normalize() - pd.to_datetime(joined.last_order_date)
    ).dt.days
    within = joined.last_order_date.notna() & (days <= 8500)
    assert (joined.matched == within).all()
    assert (
        joined.loc[within].last_order_within_tol
        == joined.loc[within].last_order_date
    ).all()
    assert joined.loc[~within].last_order_within_tol.isna().all()
    assert within.any() and (~within).any()


def test_emb_doc_coverage_arithmetic(spark):
    """Counts reconcile with the raw tables: matched + per-side
    orphans partition each side; coverage is integer basis points."""
    from meteaudata_spark.ext.simsearch import emb_doc_coverage

    out = emb_doc_coverage(spark, SF).toPandas().iloc[0]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out.n_docs == n_docs and out.n_vecs == n_vecs
    assert out.n_matched + out.n_docs_without_vec == n_docs
    assert out.n_matched + out.n_vecs_without_doc == n_vecs
    assert out.coverage_bp == out.n_matched * 10000 // n_docs


# ----------------------------------------------------------------------
# ts_gap_distribution / emb_similarity_histogram / doc_lang_confusion
# ----------------------------------------------------------------------
def test_gap_distribution_reconciles_with_raw_gaps(spark):
    """Bucket counts sum to (n_events − n_types); min/max per bucket
    respect the bucket's minute range; the 10+ bucket is open-ended."""
    from meteaudata_spark.ext import timeseries_queries as tsq

    out = tsq.ts_gap_distribution(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_events = ev.count()
    n_types = ev.select("event_type").distinct().count()
    assert out.n_gaps.sum() == n_events - n_types
    inside = out[out.gap_bucket_min < 10]
    assert (inside.min_gap_sec >= inside.gap_bucket_min * 60).all()
    assert (inside.max_gap_sec < (inside.gap_bucket_min + 1) * 60).all()
    top = out[out.gap_bucket_min == 10]
    assert (top.min_gap_sec >= 600).all() if len(top) else True


def test_similarity_histogram_reconciles_with_scored_pairs(spark):
    """Bucket counts sum to the scored-pair cardinality; every
    bucket's min/max cosine sit inside [bucket/10, (bucket+1)/10)."""
    from meteaudata_spark.ext import simsearch

    hist = simsearch.emb_similarity_histogram(spark, SF).toPandas()
    scored = simsearch.emb_lsh_near_pairs(spark, SF, threshold=-1.0)
    assert hist.n_pairs.sum() == scored.count()
    for _, r in hist.iterrows():
        assert r.min_cosine >= r.cos_bucket / 10 - 1e-12
        assert r.max_cosine < (r.cos_bucket + 1) / 10 + 1e-12


def test_lang_confusion_diagonal_dominates_and_shares_sum(spark):
    """Per true language: shares sum to ~10000 bp (floor-div loss
    < n_cells) and the diagonal cell is the argmax — the heuristic
    must beat every single confusion on this corpus."""
    from meteaudata_spark.ext import textstats

    out = textstats.doc_lang_confusion(spark, SF).toPandas()
    for lang, grp in out.groupby("lang"):
        assert 10000 - len(grp) < grp.share_bp.sum() <= 10000
        diag = grp[grp.pred_lang == lang]
        if len(diag):
            assert diag.n_docs.iloc[0] == grp.n_docs.max()


# ----------------------------------------------------------------------
# ts_seasonal_strength / doc_packing_efficiency
# ----------------------------------------------------------------------
def test_seasonal_strength_matches_numpy_variances(spark):
    """Recompute F_s from the decompose output with numpy on the same
    milli-quantized integers: values must agree exactly; strength is
    in [0, 1e6]."""
    import numpy as np

    from meteaudata_spark.ext import timeseries_queries as tsq

    dec = tsq.ts_seasonal_decompose(spark, SF).toPandas()
    out = (
        tsq.ts_seasonal_strength(spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    assert (out.strength_micros >= 0).all()
    assert (out.strength_micros <= 1_000_000).all()
    for etype, grp in dec.groupby("event_type"):
        r = np.round(grp.residual.values * 1000).astype(np.int64)
        sr = np.round(
            (grp.seasonal.values + grp.residual.values) * 1000
        ).astype(np.int64)
        n = len(r)
        var_r = float(n) * float((r * r).sum()) - float(r.sum()) ** 2
        var_sr = float(n) * float((sr * sr).sum()) - float(sr.sum()) ** 2
        fs = max(0.0, 1.0 - var_r / var_sr) if var_sr else None
        row = out.loc[etype]
        assert row.n_buckets == n
        if fs is not None:
            assert row.strength_micros == round(fs * 1_000_000)


def test_seasonal_strength_planted_pure_sine_vs_noise(spark):
    """Sanity on planted series through the same integer-variance
    formula: a strong diurnal component scores near 1e6, pure noise
    scores near 0 (validates the metric's direction, independent of
    the decompose)."""
    import numpy as np

    rng = np.random.RandomState(7)
    hod = np.arange(24 * 30)
    seasonal = 100 * np.sin(2 * np.pi * (hod % 24) / 24)
    noise = rng.normal(0, 1, len(hod))

    def fs(s, r):
        sm = np.round(s * 1000).astype(np.int64)
        rm = np.round(r * 1000).astype(np.int64)
        srm = np.round((s + r) * 1000).astype(np.int64)
        n = len(rm)
        vr = float(n) * float((rm * rm).sum()) - float(rm.sum()) ** 2
        vsr = float(n) * float((srm * srm).sum()) - float(srm.sum()) ** 2
        return max(0.0, 1.0 - vr / vsr)

    assert fs(seasonal, noise) > 0.99
    assert fs(noise * 0 + 1e-9, noise) < 0.01


def test_packing_efficiency_reconciles_with_packed_rows(spark):
    """Per lang: bin count/fill/overflow re-derived from the
    doc_pack_sequences rows match; fill share is the exact floor-div."""
    from meteaudata_spark.ext import corpus_ops

    packed = corpus_ops.doc_pack_sequences(spark, SF).toPandas()
    out = (
        corpus_ops.doc_packing_efficiency(spark, SF)
        .toPandas()
        .set_index("lang")
    )
    for lang, grp in packed.groupby("lang"):
        fills = grp.groupby("bin_id").bin_fill.max()
        row = out.loc[lang]
        assert row.n_docs == len(grp)
        assert row.total_tokens == grp.n_tokens.sum()
        assert row.n_bins == len(fills)
        assert row.n_overflow_bins == (fills > 200).sum()
        assert row.min_bin_fill == fills.min()
        assert row.avg_fill_bp == grp.n_tokens.sum() * 10000 // (
            len(fills) * 200
        )


# ----------------------------------------------------------------------
# doc_jaccard_histogram / ts_downtime_report / orders_rfm_segments
# ----------------------------------------------------------------------
def test_jaccard_histogram_reconciles_with_pairs(spark):
    """Bucket counts sum to the mined-pair cardinality; bucket ranges
    hold; nothing below the 0.25 mining floor."""
    from meteaudata_spark.ext import dedup

    hist = dedup.doc_jaccard_histogram(spark, SF).toPandas()
    pairs = dedup.doc_minhash_lsh_pairs(spark, SF).toPandas()
    assert hist.n_pairs.sum() == len(pairs)
    assert (hist.min_jaccard >= 0.25).all()
    for _, r in hist.iterrows():
        assert r.min_jaccard >= r.jaccard_bucket / 10 - 1e-12
        assert r.max_jaccard < (r.jaccard_bucket + 1) / 10 + 1e-12


def test_downtime_report_consistent_with_gap_stream(spark):
    """Re-derive outages from the raw event stream with pandas:
    counts, longest, downtime and availability must match exactly."""
    from meteaudata_spark.ext import timeseries_queries as tsq

    out = (
        tsq.ts_downtime_report(spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "ts")
        .toPandas()
    )
    for etype, grp in ev.groupby("event_type"):
        ts = grp.ts.sort_values().reset_index(drop=True)
        micros = ts.astype("int64") // 1000
        gaps = (micros.diff().dropna() // 1_000_000).astype("int64")
        outages = gaps[gaps > 120]
        row = out.loc[etype]
        span = int((micros.iloc[-1] - micros.iloc[0]) // 1_000_000)
        assert row.n_outages == len(outages)
        assert row.longest_outage_sec == (outages.max() if len(outages) else 0)
        assert row.downtime_sec == outages.sum()
        assert row.span_sec == span
        assert row.availability_bp == (span - outages.sum()) * 10000 // span


def test_rfm_segments_partition_customers(spark):
    """Segment sizes sum to the customer count; each dimension's
    buckets partition customers into ~thirds (up to value ties);
    monetary bucket 2 segments average more cents than bucket 0."""
    from meteaudata_spark.ext import relational

    out = relational.orders_rfm_segments(spark, SF).toPandas()
    n_cust = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert out.n_customers.sum() == n_cust
    assert out.segment.str.match(r"^R[0-2]F[0-2]M[0-2]$").all()
    m0 = out[out.segment.str.endswith("M0")]
    m2 = out[out.segment.str.endswith("M2")]
    avg0 = (m0.avg_monetary_cents * m0.n_customers).sum() / m0.n_customers.sum()
    avg2 = (m2.avg_monetary_cents * m2.n_customers).sum() / m2.n_customers.sum()
    assert avg2 > avg0


# ----------------------------------------------------------------------
# degenerate events/orders sweep for the r9 ts_/orders rows
# ----------------------------------------------------------------------
def test_r9_ts_rows_survive_degenerate_events(spark, tmp_path):
    """ANSI landmine sweep for the round-9 event/order rows: a type
    with a SINGLE event (span 0 — the availability div-by-zero trap),
    a type whose events share one timestamp (all gaps 0), a customer
    with one order, and a user with no orders at all.  Every query
    must run; downtime must report the vacuous 10000 bp for the
    single-event type."""
    import datetime as dt

    sf = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (1, t0, 10, "solo", 1.0, "{}"),
        (2, t0, 11, "same_ts", 1.0, "{}"),
        (3, t0, 11, "same_ts", 2.0, "{}"),
        (4, t0, 12, "normal", 1.0, "{}"),
        (5, t0 + dt.timedelta(seconds=200), 12, "normal", 2.0, "{}"),
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    orders = [(1, 11, "O", 100.0, dt.datetime(2020, 1, 1), "1-URGENT")]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")

    from meteaudata_spark.ext import relational
    from meteaudata_spark.ext import timeseries_queries as tsq

    gaps = tsq.ts_gap_distribution(spark, sf).toPandas()
    assert set(gaps.event_type) == {"same_ts", "normal"}  # solo: no gaps
    down = tsq.ts_downtime_report(spark, sf).toPandas().set_index("event_type")
    assert down.loc["solo"].span_sec == 0
    assert down.loc["solo"].availability_bp == 10000
    assert down.loc["normal"].n_outages == 1
    tol = tsq.ts_asof_tolerance(spark, sf).toPandas()
    assert len(tol) == 5  # every event keeps a row; no-order users null
    assert not tol[tol.user_id == 10].matched.any()
    tsq.ts_seasonal_strength(spark, sf).count()  # must not raise
    rfm = relational.orders_rfm_segments(spark, sf).toPandas()
    assert rfm.n_customers.sum() == 1
