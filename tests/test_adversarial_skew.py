"""Adversarial-skew smoke for the pair-mining joins: a corpus where
EVERY row lands on one join key (identical simhash signatures /
identical embeddings → one LSH bucket per table).  The hot key's pair
volume is inherently quadratic (all pairs genuinely qualify), so N is
sized to ~2M output pairs; the assertion is that the job COMPLETES
within a wall budget and returns the exact closed-form pair count —
i.e. the skewed equi-join neither stalls on one straggler task past
the budget nor drops candidates."""

import time

import pytest
from pyspark.sql import functions as F

N_HOT = 2000
EXPECT_PAIRS = N_HOT * (N_HOT - 1) // 2
BUDGET_S = 240  # generous: CI host carries external load


def test_simhash_block_join_survives_identical_corpus(spark):
    from meteaudata_spark.ext.dedup import simhash_near_pairs

    sig = spark.range(N_HOT).select(
        F.col("id").alias("doc_id"), F.lit(0x5A5A).alias("simhash")
    )
    t0 = time.perf_counter()
    got = simhash_near_pairs(sig, bits=16, k=2).count()
    dt = time.perf_counter() - t0
    assert got == EXPECT_PAIRS
    assert dt < BUDGET_S, f"hot-key simhash join took {dt:.0f}s"


def test_lsh_bucket_join_survives_identical_corpus(spark):
    from meteaudata_spark.ext.simsearch import _LSH_DIM, lsh_near_pairs

    emb = spark.range(N_HOT).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("label"),
        F.expr(
            f"transform(sequence(1, {_LSH_DIM}), i -> CAST(0.5 AS DOUBLE))"
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    # identical vectors: every pair has cosine exactly 1.0
    got = lsh_near_pairs(emb, threshold=0.999, n_vectors=N_HOT).count()
    dt = time.perf_counter() - t0
    assert got == EXPECT_PAIRS
    assert dt < BUDGET_S, f"hot-bucket LSH join took {dt:.0f}s"


def test_segment_dedup_survives_identical_corpus(spark):
    """All-identical docs concentrate every row of the
    first-occurrence window on a handful of segment keys.  Unlike the
    pair miners the output is linear, so the only risk is the hot
    window partition stalling; assert completion within budget and
    the exact keep counts (doc 0 keeps everything, the rest nothing)."""
    from meteaudata_spark.ext.dedup import segment_dedup

    n = 200_000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d e f g h i j k l m n o p").alias("text"),
    )
    t0 = time.perf_counter()
    out = segment_dedup(d, seg_words=8)
    agg = out.agg(
        F.sum("n_kept").alias("kept"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    dt = time.perf_counter() - t0
    assert agg["docs"] == n
    assert agg["kept"] == 2  # only doc 0's two segments survive
    assert dt < BUDGET_S, f"hot-segment dedup took {dt:.0f}s"


def test_semdedup_prededup_collapses_identical_corpus(spark):
    """Adversarial: 5000 byte-identical vectors all land in ONE
    cluster.  exact_prededup must make the job linear (one
    representative reaches the pair stage) and drop everything but
    vec 0 with keep_id 0."""
    import time

    import numpy as np
    import pandas as pd

    from meteaudata_spark.ext.simsearch import semdedup

    v = np.arange(64, dtype=np.float32) / 64.0
    d = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(5000), "embedding": [v.tolist()] * 5000, "label": 0}
        )
    )
    t0 = time.perf_counter()
    out = semdedup(d, threshold=0.9, exact_prededup=True).collect()
    dt = time.perf_counter() - t0
    assert dt < 60, f"adversarial corpus took {dt:.0f}s"
    assert len(out) == 4999
    assert all(r["keep_id"] == 0 and r["max_cos"] == 1.0 for r in out)
    assert {r["drop_id"] for r in out} == set(range(1, 5000))


def test_semdedup_prededup_same_drop_set_on_mixed_corpus(spark):
    """Differential: on a corpus with planted exact dups plus organic
    near-dups, prededup mode must produce the SAME drop set as plain
    mode (diagnostic columns may differ)."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.ext.simsearch import semdedup

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(160, 64)).astype(np.float32)
    for dup, src in ((150, 3), (151, 3), (152, 40), (153, 101)):
        vecs[dup] = vecs[src]
    d = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(160), "embedding": [x.tolist() for x in vecs], "label": 0}
        )
    )
    plain = {r["drop_id"] for r in semdedup(d, threshold=0.2).collect()}
    pre = {
        r["drop_id"]
        for r in semdedup(d, threshold=0.2, exact_prededup=True).collect()
    }
    assert plain == pre and {150, 151, 152, 153} <= pre


def test_segment_dedup_survives_power_law_lengths(spark):
    """Power-law document lengths: one 100k-word giant, a long tail of
    tiny docs.  The giant's explode fans one input row into ~12k
    segment rows (task skew on the explode side) and its segments all
    hash to first-occurrence windows shared with the tail.  Assert
    completion within budget and the exact first-occurrence
    arithmetic."""
    from meteaudata_spark.ext.dedup import segment_dedup

    n_tail = 50_000
    seg_words = 8
    # giant doc 0: words w0..w99999 -> 12500 distinct segments;
    # tail doc i repeats the giant's i-th segment exactly
    giant = " ".join(f"w{i}" for i in range(100_000))
    tail = spark.range(1, n_tail + 1).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    ((F.col("id") - 1) % 12_500) * seg_words + w,
                )
                for w in range(seg_words)
            ],
        ).alias("text"),
    )
    d = spark.createDataFrame([(0, giant)], "doc_id long, text string").unionByName(
        tail
    )
    t0 = time.perf_counter()
    out = segment_dedup(d, seg_words=seg_words)
    rows = {r["doc_id"]: r for r in out.collect()}
    dt = time.perf_counter() - t0
    assert rows[0]["n_kept"] == 12_500  # giant owns every segment
    tail_kept = sum(rows[i]["n_kept"] for i in range(1, n_tail + 1))
    assert tail_kept == 0  # every tail doc repeats a giant segment
    assert dt < BUDGET_S, f"power-law segment dedup took {dt:.0f}s"


def test_dedup_clusters_survive_one_giant_component(spark):
    """One hub vertex with 100k spokes (the hot-key shape for the
    label-propagation join) plus a 30-node chain: the hub's join key
    carries the whole edge list.  Assert the exact component labels,
    convergence within the iteration cap, and the wall budget."""
    from meteaudata_spark.ext.dedup import dedup_clusters

    n_spokes = 100_000
    star = spark.range(1, n_spokes + 1).select(
        F.lit(0).alias("doc_a"), F.col("id").alias("doc_b")
    )
    chain_base = 10_000_000
    chain = spark.range(30).select(
        (F.col("id") + chain_base).alias("doc_a"),
        (F.col("id") + chain_base + 1).alias("doc_b"),
    )
    t0 = time.perf_counter()
    out = dedup_clusters(star.unionByName(chain))
    agg = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("cluster_size").alias("sz")
    ).collect()
    dt = time.perf_counter() - t0
    by_id = {r["cluster_id"]: r for r in agg}
    assert set(by_id) == {0, chain_base}
    assert by_id[0]["n"] == by_id[0]["sz"] == n_spokes + 1
    assert by_id[chain_base]["n"] == by_id[chain_base]["sz"] == 31
    assert dt < BUDGET_S, f"giant-component clustering took {dt:.0f}s"


def test_image_neardup_survives_identical_payload_mass(spark):
    """500 byte-identical images → every row lands on the same four
    block keys; the miner must finish (AQE skew split) and return the
    exact closed-form pair count C(500,2), all at Hamming 0."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.ext.multimodal import (
        encode_ppm,
        image_ahash_blocks,
        image_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    payload = encode_ppm(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    noise = [
        (500 + i, encode_ppm(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, payload) for i in range(500)] + noise,
            columns=["asset_id", "payload"],
        )
    )
    pairs = image_neardup_pairs(image_ahash_blocks(df), max_hamming=0)
    hot = pairs.filter("doc_a < 500 and doc_b < 500")
    assert hot.count() == 500 * 499 // 2
