"""Round-7 part b: scale smokes for the substring-span detector and
the streaming segment dedup.

Usage: python tools/scale_smoke_r7b.py [n_docs]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.dedup import doc_substring_spans  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.segdedup_stream import (  # noqa: E402
    stream_segment_dedup,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("scale-smoke-r7b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    tmp = tempfile.mkdtemp()
    # 24-word docs; 0.5% of docs copy an earlier doc's text verbatim
    n_dups = n_docs // 200
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
                for w in range(24)
            ],
        ).alias("text"),
    )
    docs.write.mode("overwrite").parquet(f"{tmp}/docs")
    d = spark.read.parquet(f"{tmp}/docs")

    # doc_substring_spans reads {sf_dir}/documents.parquet; stage it
    d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    t0 = time.perf_counter()
    out = doc_substring_spans(spark, tmp)
    n_dup_docs = out.filter(F.col("dup_words") > 0).count()
    dt = time.perf_counter() - t0
    print(
        f"substring spans: {n_docs:,} docs in {dt:.1f}s "
        f"({n_docs / dt:,.0f} docs/s), {n_dup_docs:,} docs with dup spans "
        f"(planted {n_dups:,})",
        flush=True,
    )

    src = f"{tmp}/stream_src"
    d.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_segment_dedup(stream, seg_words=8)
        .writeStream.format("memory")
        .queryName("segsmoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    kept = spark.table("segsmoke").count()
    print(
        f"stream segment dedup: {n_docs:,} docs in {dt:.1f}s "
        f"({n_docs / dt:,.0f} docs/s), {kept:,} segments kept",
        flush=True,
    )


if __name__ == "__main__":
    main()
