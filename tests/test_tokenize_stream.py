"""Streaming tokenizer encode == batch unigram_lm_encode_stats: train
the vocabulary batch-side, stream the same corpus through
stream_token_counts, and match the per-lang totals EXACTLY."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_token_counts_matches_batch_encode(spark, tmp_path):
    from meteaudata_spark.ext.textstats import (
        _docs,
        doc_unigram_lm_encode,
        doc_unigram_lm_train,
    )
    from meteaudata_spark.streaming.tokenize_stream import (
        stream_token_counts,
    )

    vocab = [
        (r["piece"], r["logp_micros"])
        for r in doc_unigram_lm_train(spark, SF).collect()
    ]
    batch = (
        doc_unigram_lm_encode(spark, SF)
        .toPandas()
        .set_index("lang")
        .sort_index()
    )

    src = str(tmp_path / "src")
    _docs(spark, SF).select("lang", "text").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    out = stream_token_counts(stream, vocab)
    q = (
        out.writeStream.format("memory")
        .queryName("tok_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.table("tok_stream")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .toPandas()
        .set_index("lang")
        .sort_index()
    )
    assert list(got.index) == list(batch.index)
    for lang in got.index:
        assert got.loc[lang, "n_words"] == batch.loc[lang, "n_words"], lang
        assert got.loc[lang, "n_chars"] == batch.loc[lang, "n_char_tokens"], lang
        assert (
            got.loc[lang, "n_tokens"] == batch.loc[lang, "n_unigram_tokens"]
        ), lang


def test_stream_token_counts_rejects_empty_vocab(spark):
    from meteaudata_spark.streaming.tokenize_stream import (
        stream_token_counts,
    )

    with pytest.raises(ValueError, match="vocab"):
        stream_token_counts(None, [])
