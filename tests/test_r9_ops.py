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
