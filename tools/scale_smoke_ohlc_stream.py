"""Streaming OHLC throughput smoke: 10M synthetic events (4 types ×
30 days) through ``stream_ohlc_daily`` in availableNow micro-batches,
update rows drained to parquet.  Verifies the final candles equal the
batch fold over the same rows EXACTLY and reports throughput + the
state bound (one struct row per open candle — 120 rows for any
stream length).

Usage: python tools/scale_smoke_ohlc_stream.py [n_records]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.ohlc_stream import (  # noqa: E402
    stream_ohlc_daily,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-smoke-ohlc-stream")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        base = (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                (
                    F.lit("2024-01-01 00:00:00").cast("timestamp")
                    + F.make_interval(secs=F.pmod(F.col("id") * 7919, F.lit(2_592_000)).cast("double"))
                ).alias("ts"),
                F.concat(
                    F.lit("t"), F.pmod(F.col("id"), F.lit(4)).cast("string")
                ).alias("event_type"),
                (
                    F.pmod(F.col("id") * 2654435761 % 2**31, F.lit(100000))
                    / 100.0
                ).alias("value"),
            )
        )
        base.repartition(32).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src)
        )
        sink = f"{tmp}/sink"

        def write_updates(df, batch_id):
            df.withColumn("b", F.lit(batch_id)).write.mode("append").parquet(
                sink
            )

        t0 = time.time()
        q = (
            stream_ohlc_daily(stream)
            .writeStream.foreachBatch(write_updates)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        ops = (q.lastProgress or {}).get("stateOperators") or []
        state_rows = sum(op.get("numRowsTotal") or 0 for op in ops)

        final = (
            spark.read.parquet(sink)
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("event_type", "day").orderBy(
                        F.col("b").desc()
                    )
                ),
            )
            .filter("rk = 1")
            .drop("rk", "b")
        )
        key = F.concat(
            F.lpad(
                F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
                20,
                "0",
            ),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        )
        batch = (
            spark.read.parquet(src)
            .select(
                "event_type",
                F.date_trunc("day", F.col("ts").cast("timestamp")).alias(
                    "day"
                ),
                "value",
                key.alias("k"),
            )
            .groupBy("event_type", "day")
            .agg(
                F.min_by("value", "k").alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", "k").alias("close"),
                F.count(F.lit(1)).cast("bigint").alias("volume"),
            )
        )
        n_diff = (
            final.exceptAll(batch).count() + batch.exceptAll(final).count()
        )
        n_candles = batch.count()
        print(
            f"records={n:,} wall={wall:.1f}s rate={n / wall:,.0f} rec/s "
            f"candles={n_candles} diff_rows={n_diff} state_rows={state_rows}"
        )
        assert n_diff == 0, "streamed candles != batch candles"

    spark.stop()


if __name__ == "__main__":
    main()
