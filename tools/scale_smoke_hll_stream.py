"""Sliding-uniques streaming smoke: 10M synthetic events (30 days ×
1M-user id space) driven through ``stream_hll_day_registers`` in
availableNow micro-batches, then max-merged into trailing windows by
``merge_sliding_registers``.  Verifies the lambda contract at scale:
the streamed per-day register arrays must equal the batch register
build bit for bit (so every downstream window estimate is identical
by construction), and reports throughput plus the state bound
(m=256 longs per day key — 30 state rows for any stream length).

Usage: python tools/scale_smoke_hll_stream.py [n_records] [n_users]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.dedup import _h60  # noqa: E402
from meteaudata_spark.ext.sketches import (  # noqa: E402
    _M,
    merge_sliding_registers,
)
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.hll_stream import (  # noqa: E402
    stream_hll_day_registers,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("scale-smoke-hll-stream")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        base = (
            spark.range(n)
            .withColumn(
                "key",
                F.date_add(
                    F.lit("2024-01-01").cast("date"),
                    F.pmod(F.col("id"), F.lit(30)).cast("int"),
                ).cast("string"),
            )
            .withColumn(
                "h",
                _h60(
                    F.pmod(
                        F.col("id") * 2654435761 % 2**31, F.lit(n_users)
                    ).cast("string")
                ),
            )
            .select("key", "h")
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
            df.write.mode("append").parquet(sink)

        t0 = time.time()
        q = (
            stream_hll_day_registers(stream)
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

        # final streamed registers = last update per key; the sink has
        # no batch ordering column, so fold with element-wise max —
        # registers only grow, so max over all updates == final state
        streamed = (
            spark.read.parquet(sink)
            .select("key", F.posexplode("regs").alias("b", "m"))
            .groupBy("key", "b")
            .agg(F.max("m").alias("m"))
        )
        batch = (
            spark.read.parquet(src)
            .select(
                "key",
                F.pmod(F.col("h"), F.lit(_M)).alias("b"),
                F.when(F.expr(f"h div {_M}") == 0, F.lit(53))
                .otherwise(
                    F.lit(53) - F.length(F.bin(F.expr(f"h div {_M}")))
                )
                .alias("r"),
            )
            .groupBy("key", "b")
            .agg(F.max("r").alias("m"))
        )
        diff = (
            streamed.filter(F.col("m") > 0)
            .exceptAll(batch)
            .count()
            + batch.exceptAll(streamed.filter(F.col("m") > 0)).count()
        )
        # merged trailing-window estimates from the streamed registers
        day_regs = (
            streamed.groupBy("key")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("b", "m"))
                ).alias("bm")
            )
            .select(
                F.col("key").cast("date").alias("day"),
                F.expr(
                    f"transform(sequence(0, {_M - 1}), i -> "
                    "coalesce(element_at(map_from_arrays("
                    "transform(bm, x -> x.b), transform(bm, x -> x.m)),"
                    " i), cast(0 as bigint)))"
                ).alias("regs"),
            )
        )
        n_windows = merge_sliding_registers(day_regs, 7).count()
        print(
            f"records={n:,} wall={wall:.1f}s rate={n / wall:,.0f} rec/s "
            f"state_rows={state_rows} register_diff_rows={diff} "
            f"windows={n_windows}"
        )
        assert diff == 0, "streamed registers != batch registers"
        assert n_windows == 30

    spark.stop()


if __name__ == "__main__":
    main()
