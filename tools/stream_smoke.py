"""Streaming scale smoke: push n_rows synthetic events through the
watermarked streaming resample (file source → tumbling-window agg →
noop-equivalent memory sink) and report end-to-end throughput.

Usage: python tools/stream_smoke.py [n_rows] [n_keys] [n_files]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.resample_stream import (  # noqa: E402
    stream_resample_mean,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    spark = get_spark("stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    src = tempfile.mkdtemp(prefix="stream_smoke_") + "/src"

    (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_keys).cast("string").alias("event_type"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") / n_keys).cast("long")
            ).alias("timestamp"),
            F.sin(F.col("id") / 1000.0).alias("value"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    print(f"source written: {n_rows:,} rows in {n_files} files", flush=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, n_files // 8))
        .parquet(src)
    )
    out = stream_resample_mean(
        stream, "1min", watermark="10 minutes", partition_cols=["event_type"]
    )
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("memory")
        .queryName("smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3000)
    elapsed = time.perf_counter() - t0
    n_out = spark.table("smoke").count()
    rate = n_rows / elapsed
    print(
        f"streamed {n_rows:,} rows -> {n_out:,} windows in "
        f"{elapsed:.1f} s ({rate/1e6:.1f}M rows/s end-to-end, "
        f"micro-batches of ~{n_rows // 8:,} rows)",
        flush=True,
    )
    # custom-state path: Welford running stats via applyInPandasWithState
    from meteaudata_spark.streaming.stateful import stream_running_stats

    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, n_files // 8))
        .parquet(src)
    )
    t0 = time.perf_counter()
    q2 = (
        stream_running_stats(stream2, key_col="event_type")
        .writeStream.format("memory")
        .queryName("smoke_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(3000)
    elapsed2 = time.perf_counter() - t0
    rate2 = n_rows / elapsed2
    print(
        f"stateful (Welford) pass: {elapsed2:.1f} s "
        f"({rate2/1e6:.1f}M rows/s through applyInPandasWithState)",
        flush=True,
    )

    import json

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_keys": n_keys,
                "elapsed_sec": round(elapsed, 1),
                "rows_per_sec": int(rate),
                "windows_emitted": n_out,
                "stateful_elapsed_sec": round(elapsed2, 1),
                "stateful_rows_per_sec": int(rate2),
            }
        )
    )


if __name__ == "__main__":
    main()
