"""Round-7 part c: scale smokes for the perceptual-hash image
near-dup miner and the session_window streaming sessionizer.

Usage: python tools/scale_smoke_r7c.py [n_assets] [n_events]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.multimodal import (  # noqa: E402
    encode_ppm,
    image_ahash_blocks,
    image_neardup_pairs,
)
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.sessionize_stream import (  # noqa: E402
    stream_sessionize,
)


def main() -> None:
    n_assets = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("scale-smoke-r7c")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp()

    # --- image near-dup: 1% of assets are byte-exact copies of an
    # earlier asset (hamming 0); everything else is digest noise
    n_dups = n_assets // 100

    def build(it):
        for pdf in it:
            ids, payloads = [], []
            for i in pdf["id"]:
                src = i % (n_assets - n_dups) if i >= n_assets - n_dups else i
                rng = np.random.default_rng(int(src))
                arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                ids.append(i)
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    assets = spark.range(n_assets).mapInPandas(
        build, "asset_id bigint, payload binary"
    )
    assets.write.mode("overwrite").parquet(f"{tmp}/assets")
    a = spark.read.parquet(f"{tmp}/assets")
    t0 = time.perf_counter()
    pairs = image_neardup_pairs(image_ahash_blocks(a), max_hamming=3)
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    print(
        f"image neardup: {n_assets:,} assets hashed+mined in {dt:.1f}s "
        f"({n_assets / dt:,.0f} assets/s), {n_pairs:,} pairs "
        f"(planted {n_dups:,} exact twins)",
        flush=True,
    )

    # --- streaming sessionization over n_events
    src = f"{tmp}/events"
    ev = spark.range(n_events).select(
        (F.col("id") % 50_000).alias("user_id"),
        F.expr(
            "timestamp '2024-05-01' + make_interval(0,0,0,0,0,"
            "cast((id div 50000) * 13 + ((id div 50000) div 2) * 35 as int),0)"
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_sessionize(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sesssmoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n_sessions = spark.table("sesssmoke").count()
    print(
        f"stream sessionize: {n_events:,} events in {dt:.1f}s "
        f"({n_events / dt:,.0f} events/s), {n_sessions:,} closed sessions",
        flush=True,
    )


if __name__ == "__main__":
    main()
