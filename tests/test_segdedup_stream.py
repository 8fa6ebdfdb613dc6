"""Streaming segment dedup (streaming/segdedup_stream.py): single-batch
replay reproduces the batch operator's keep set exactly; first arrival
wins across micro-batches; knob validation."""

import os
import shutil
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_single_batch_matches_batch_operator(spark, tmp_path):
    """availableNow over a static corpus (one micro-batch): the kept
    segment set equals batch segment_dedup's lowest-(doc_id, seg_idx)
    rule — per-doc kept counts AND reassembled dedup hashes match."""
    from meteaudata_spark.ext.dedup import segment_dedup
    from meteaudata_spark.streaming.segdedup_stream import (
        stream_segment_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batch = {
        r["doc_id"]: (r["n_kept"], r["dedup_hash"])
        for r in segment_dedup(docs, seg_words=8).collect()
    }

    src = str(tmp_path / "src")
    docs.select("doc_id", "text").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_segment_dedup(stream, seg_words=8)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("segdedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("segdedup_stream")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.expr(
                        "transform(array_sort(collect_list(struct(seg_idx, segment))), s -> s.segment)"
                    ),
                )
            ).alias("dedup_hash"),
        )
        .collect()
    )
    got = {r["doc_id"]: (r["n_kept"], r["dedup_hash"]) for r in got}
    # stream emits only docs that kept >=1 segment; batch reports all
    batch_nonzero = {k: v for k, v in batch.items() if v[0] > 0}
    assert got == batch_nonzero and len(got) > 0


def test_first_arrival_wins_across_batches(spark, tmp_path):
    from meteaudata_spark.streaming.segdedup_stream import (
        stream_segment_dedup,
    )

    text = "a b c d e f g h i j k l m n o p"  # two 8-word segments
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    schema = None
    # doc 9 arrives FIRST (higher id), doc 1 re-sends the same text later
    for i, (doc_id, t) in enumerate([(9, text), (1, text), (3, "q r s t u v w x")]):
        staging = str(tmp_path / f"st{i}")
        spark.createDataFrame(
            pd.DataFrame([(doc_id, t)], columns=["doc_id", "text"])
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        schema = spark.read.parquet(staging).schema
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = f"{src}/{i}.parquet"
        shutil.copy(f"{staging}/{part}", dst)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream_segment_dedup(stream)
        .writeStream.format("memory")
        .queryName("segdedup_order")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {
        (r["doc_id"], r["seg_idx"])
        for r in spark.table("segdedup_order").collect()
    }
    # doc 9 arrived first and keeps both segments; doc 1's identical
    # text keeps nothing; doc 3 is fresh
    assert kept == {(9, 0), (9, 1), (3, 0)}


def test_stream_segment_dedup_validates_knobs(spark):
    from meteaudata_spark.streaming.segdedup_stream import (
        stream_segment_dedup,
    )

    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        stream_segment_dedup(d, seg_words=0)
    with pytest.raises(ValueError):
        stream_segment_dedup(d, state_shards=0)
