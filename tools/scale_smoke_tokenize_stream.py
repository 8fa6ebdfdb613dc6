"""Throughput smoke for the streaming tokenizer encode
(``streaming/tokenize_stream.py``): N synthetic documents streamed
through ``stream_token_counts`` with a vocabulary trained batch-side
on a prefix; reports wall time, docs/s and words/s, and asserts the
streamed totals equal the batch encode EXACTLY on the same corpus.

Usage: python tools/scale_smoke_tokenize_stream.py [n_docs]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.textstats import unigram_lm_train  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.tokenize_stream import (  # noqa: E402
    stream_token_counts,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("tokenize-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic corpus: ~50 words/doc over a bounded word vocabulary
    # (the realistic regime — the worker-local memo is what makes the
    # per-word Viterbi amortize)
    docs = spark.range(n_docs).selectExpr(
        "concat('lang', cast(id % 5 as string)) AS lang",
        "array_join(transform(sequence(1, 50),"
        " i -> concat('w', cast((id * 31 + i * 7) % 997 as string))),"
        " ' ') AS text",
    )
    vocab_df = unigram_lm_train(docs.limit(2000))
    vocab = [(r["piece"], r["logp_micros"]) for r in vocab_df.collect()]

    src = tempfile.mkdtemp() + "/src"
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(src)
    )
    t0 = time.perf_counter()
    out = stream_token_counts(stream, vocab)
    q = (
        out.writeStream.format("memory")
        .queryName("tok_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1200)
    got = (
        spark.table("tok_smoke")
        .groupBy("lang")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .collect()
    )
    dt = time.perf_counter() - t0
    n_words = sum(r["n_words"] for r in got)
    print(
        f"tokenize-stream {n_docs:,} docs / {n_words:,} words: "
        f"{dt:.1f} s -> {n_docs / dt:,.0f} docs/s, "
        f"{n_words / dt:,.0f} words/s"
    )
    want = {
        r["lang"]: (r["n_words"], r["n_char_tokens"], r["n_unigram_tokens"])
        for r in _encode_with(spark, spark.read.parquet(src), vocab_df).collect()
    }
    got_map = {r["lang"]: (r["n_words"], r["n_chars"], r["n_tokens"]) for r in got}
    assert got_map == want, (got_map, want)
    print("streamed totals == batch encode: OK")
    spark.stop()


def _encode_with(spark, docs, vocab_df):
    """Per-lang totals by joining the corpus against the per-word
    Viterbi lengths computed with the TRAINED vocab — the same
    definition stream_token_counts meters."""
    from meteaudata_spark.streaming.tokenize_stream import _viterbi_len

    lp = {r["piece"]: int(r["logp_micros"]) for r in vocab_df.collect()}
    max_len = max(len(p) for p in lp)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter((F.col("word") != "") & (F.length("word") <= 32))
        .distinct()
        .collect()
    )
    rows = [(r["word"], len(r["word"]), _viterbi_len(r["word"], lp, max_len)) for r in words]
    wt = spark.createDataFrame(rows, "word string, n_chars_word long, n_tokens_word long")
    exploded = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter((F.col("word") != "") & (F.length("word") <= 32))
    return (
        exploded.join(F.broadcast(wt), "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_chars_word").alias("n_char_tokens"),
            F.sum("n_tokens_word").alias("n_unigram_tokens"),
        )
    )


if __name__ == "__main__":
    main()
