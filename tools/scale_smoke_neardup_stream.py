"""Throughput/state smoke for the streaming near-dup detector:
N synthetic docs (0.5% exact re-sends) through availableNow micro-
batches; reports wall time, docs/s, and flagged count.

Usage: python tools/scale_smoke_neardup_stream.py [n_docs]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.neardup_stream import (  # noqa: E402
    stream_near_dup_candidates,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_dups = n_docs // 200  # 0.5% re-sent texts

    spark = get_spark("neardup-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp()
    src = f"{tmp}/src"
    # deterministic synthetic corpus: doc i's text is 12 xxhash64-
    # derived words; the final n_dups ids repeat an earlier id's text
    base = F.when(
        F.col("doc_id") >= n_docs - n_dups, F.col("doc_id") % (n_docs - n_dups)
    ).otherwise(F.col("doc_id"))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"), base.alias("__b")
    ).select(
        "doc_id",
        F.concat_ws(
            " ",
            *[
                F.conv(F.hex(F.abs(F.xxhash64(F.col("__b"), F.lit(w)))), 16, 36)
                for w in range(12)
            ],
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_near_dup_candidates(stream)
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("memory")
        .queryName("ndsmoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    flagged = spark.table("ndsmoke").select("doc_id").distinct().count()
    print(
        f"neardup stream: {n_docs:,} docs in {dt:.1f}s "
        f"({n_docs / dt:,.0f} docs/s), {flagged:,} docs flagged "
        f"(planted {n_dups:,})",
        flush=True,
    )


if __name__ == "__main__":
    main()
