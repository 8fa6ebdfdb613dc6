"""Lambda composition for sliding uniques: streamed per-day HLL
registers max-merged into trailing windows must EQUAL the one-shot
batch operator's estimates — register merge is associative, so the
two paths agree bit-for-bit when they share hash, registers, and the
estimate fold."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streamed_day_registers_merge_equals_batch(spark, tmp_path):
    from meteaudata_spark.ext.dedup import _h60
    from meteaudata_spark.ext.sketches import (
        events_hll_sliding_uniques,
        merge_sliding_registers,
    )
    from meteaudata_spark.streaming.hll_stream import (
        stream_hll_day_registers,
    )

    src = str(tmp_path / "ev_src")
    base = spark.read.parquet(f"{SF}/events.parquet").select(
        F.to_date("ts").cast("string").alias("key"),
        _h60(F.col("user_id").cast("string")).alias("h"),
        F.col("event_id"),
    )
    # two files -> two micro-batches; split interleaves days so state
    # genuinely carries across batches
    base.filter(F.col("event_id") % 2 == 0).drop("event_id").coalesce(
        1
    ).write.parquet(src)
    base.filter(F.col("event_id") % 2 == 1).drop("event_id").coalesce(
        1
    ).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hll_day_registers(stream)
        .writeStream.format("memory")
        .queryName("hll_day_regs")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    drained = spark.table("hll_day_regs")
    # registers only grow, so the element-wise max over every drained
    # update row per key == the final state — and with sharded state
    # (n_shards > 1) the same max-fold reassembles the shards
    day_regs = (
        drained.select("key", F.posexplode("regs").alias("b", "m"))
        .groupBy("key", "b")
        .agg(F.max("m").alias("m"))
        .groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("b", "m"))).alias("bm"))
        .select(
            F.col("key").cast("date").alias("day"),
            F.expr(
                "transform(bm, x -> x.m)"
            ).alias("regs"),
        )
    )
    merged = {
        str(r["win_end"]): r["hll_uniques"]
        for r in merge_sliding_registers(day_regs, 7).collect()
    }
    batch = {
        str(r["win_end"]): r["hll_uniques"]
        for r in events_hll_sliding_uniques(spark, SF, 7).collect()
    }
    assert merged == batch
    assert len(batch) > 0
