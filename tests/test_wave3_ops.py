"""Round-10 third-wave operators: seeded shuffle sharding,
k-anonymity audit, corpus data card, windowed event dedup,
hard-negative mining, and MMR re-ranking.

Planted-case semantics here; cross-engine value equality is covered
by the DuckDB oracle gate (tools/check_correctness.py), and plan
shapes by tests/test_plans.py.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from meteaudata_spark.ext import corpus_ops, simsearch, textstats

SF = "/root/testdata/sf0.001"


# ----------------------------------------------------------------------
# shuffle_shards
# ----------------------------------------------------------------------
def test_shuffle_shards_is_deterministic_and_partition_invariant(spark):
    d = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = corpus_ops.shuffle_shards(d, n_shards=4).toPandas()
    b = (
        corpus_ops.shuffle_shards(d.repartition(13), n_shards=4)
        .toPandas()
    )
    a = a.sort_values(["shard", "pos"]).reset_index(drop=True)
    b = b.sort_values(["shard", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shuffle_shards_positions_are_contiguous_per_shard(spark):
    d = spark.range(0, 257).withColumnRenamed("id", "doc_id")
    out = corpus_ops.shuffle_shards(d, n_shards=8).toPandas()
    assert len(out) == 257
    for shard, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # hash sharding at n=257 should not starve any of 8 shards
    assert out["shard"].nunique() == 8


def test_shuffle_shards_salt_reshuffles_epoch_order(spark):
    d = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    e0 = corpus_ops.shuffle_shards(d, salt="epoch0").toPandas()
    e1 = corpus_ops.shuffle_shards(d, salt="epoch1").toPandas()
    k0 = e0.sort_values(["shard", "pos"])["doc_id"].tolist()
    k1 = e1.sort_values(["shard", "pos"])["doc_id"].tolist()
    assert sorted(k0) == sorted(k1) == list(range(200))
    assert k0 != k1  # a different salt is a different permutation


# ----------------------------------------------------------------------
# k_anonymity_report
# ----------------------------------------------------------------------
def test_k_anonymity_planted_groups(spark):
    # group A: 10 rows, group B: 3 rows, group C: 1 row
    rows = (
        [("en", "web") for _ in range(10)]
        + [("en", "book") for _ in range(3)]
        + [("fr", "web")]
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = (
        corpus_ops.k_anonymity_report(df, ["lang", "source"], [2, 5])
        .toPandas()
        .set_index("k")
    )
    # k=2: only the singleton violates
    assert out.loc[2, "violating_groups"] == 1
    assert out.loc[2, "suppressed_rows"] == 1
    assert out.loc[2, "suppression_bp"] == 1 * 10000 // 14
    # k=5: the 3-row group and the singleton violate
    assert out.loc[5, "violating_groups"] == 2
    assert out.loc[5, "suppressed_rows"] == 4
    assert out.loc[5, "n_groups"] == 3
    assert out.loc[5, "suppression_bp"] == 4 * 10000 // 14


# ----------------------------------------------------------------------
# corpus data card
# ----------------------------------------------------------------------
def test_corpus_datacard_consistent_with_exact_dedup(spark):
    from meteaudata_spark.ext import dedup

    card = corpus_ops.doc_corpus_datacard(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # volume columns must reconcile with the raw table
    assert card["n_docs"].sum() == docs.count()
    per_lang = (
        docs.groupBy("lang").agg(F.sum("n_chars").alias("tc")).toPandas()
        .set_index("lang")["tc"]
    )
    for _, row in card.iterrows():
        assert row["total_chars"] == per_lang[row["lang"]]
    # dup_excess must equal the exact-dedup excess corpus-wide
    excess = (
        dedup.doc_exact_dedup(spark, SF)
        .agg(F.sum(F.col("n_copies") - 1))
        .collect()[0][0]
    )
    assert card["dup_excess"].sum() == excess
    assert ((card["mean_quality_micros"] >= 0) & (card["mean_quality_micros"] <= 1000000)).all()


# ----------------------------------------------------------------------
# windowed event dedup (batch row + streaming twin differential)
# ----------------------------------------------------------------------
def test_events_windowed_dedup_reconciles_totals(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = corpus_ops.events_windowed_dedup(spark, SF).toPandas()
    assert out["n_events"].sum() == ev.count()
    assert (out["n_dups"] == out["n_events"] - out["n_distinct"]).all()
    assert (out["dup_bp"] <= 10000).all()


def test_stream_dedup_matches_batch_windowed_distinct(spark, tmp_path):
    """Batch<->stream differential: dropDuplicatesWithinWatermark with
    a watermark spanning the feed keeps exactly one event per
    (user, type, value) key — the batch row's n_distinct total."""
    from meteaudata_spark.streaming.resample_stream import stream_dedup

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_id") < 2000)
        .select("ts", "user_id", "event_type", "value")
    )
    src = str(tmp_path / "feed")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = stream_dedup(
        stream,
        ["user_id", "event_type", "value"],
        watermark="365 days",
        ts_col="ts",
    )
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink).count()
    want = ev.select("user_id", "event_type", "value").distinct().count()
    assert got == want


# ----------------------------------------------------------------------
# hard negatives
# ----------------------------------------------------------------------
def test_hard_negatives_excludes_same_label_and_ranks_by_cosine(spark):
    # query 0 (label 0): nearest overall is vec 1 (same label,
    # excluded); nearest cross-label must be vec 2, then vec 3.
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0], 0),   # same label — must NOT appear
        (2, [0.9, 0.1, 0.0], 1),
        (3, [0.5, 0.5, 0.0], 1),
        (4, [0.0, 1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = simsearch.hard_negatives(emb, n_queries=1, k=3).toPandas()
    assert (out["label"] != 0).all()
    assert out["vec_id"].tolist() == [2, 3, 4]
    assert out["cosine"].is_monotonic_decreasing


# ----------------------------------------------------------------------
# MMR re-ranking
# ----------------------------------------------------------------------
def test_mmr_rerank_prefers_diversity_over_redundant_runner_up(spark):
    # doc 1 and doc 2 are near-identical high-relevance docs; doc 3 is
    # less relevant but diverse.  Plain BM25 ranks (1, 2, 3); MMR must
    # pick 1 first, then skip the redundant 2 in favour of 3.
    # docs 1-3 score identical BM25 (same tf/dl), so relevance alone
    # would rank (1, 2, 3) on the doc_id tiebreak; MMR's redundancy
    # penalty (doc 2 is an exact dup of 1: sim=1e6 vs doc 3's 3/7)
    # must flip the second pick to the diverse doc 3.
    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry date fig"),
            (2, "apple banana cherry date fig"),
            (3, "apple banana cherry melon plum"),
            (4, "unrelated words entirely different topic"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "apple"), (0, "banana"), (0, "cherry")],
        "query_id long, term string",
    )
    out = textstats.mmr_rerank(docs, q, n_candidates=4, k=3).toPandas()
    picks = out.sort_values("mmr_rank")["doc_id"].tolist()
    assert picks[0] == 1
    assert picks[1] == 3, picks
    # the redundant near-dup only enters at rank 3
    assert picks[2] == 2
    # rank 1 carries no similarity penalty by construction
    assert out.loc[out["mmr_rank"] == 1, "max_sim_micros"].iloc[0] == 0


def test_mmr_rerank_scores_are_integer_exact(spark):
    out = textstats.doc_mmr_rerank(spark, SF).toPandas()
    assert (out["mmr_score"] == 7 * out["rel_unit_micros"] - 3 * out["max_sim_micros"]).all()
    assert (out.groupby("query_id")["mmr_rank"].apply(
        lambda s: sorted(s) == list(range(1, len(s) + 1))
    )).all()
