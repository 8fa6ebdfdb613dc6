"""URL-dedup streaming ledger throughput smoke: 10M synthetic crawl
records (doc_id + recorded-URL variants over ``n_pages`` canonical
pages) driven through ``stream_url_dedup`` in availableNow
micro-batches.  Update-mode rows append to a parquet sink via
foreachBatch; the final ledger is the last update per key.  Reports
wall time, records/s, ledger cardinality, the state bound from query
progress (one JVM state-store row per DISTINCT normalized URL — the
same bound the batch shuffle pays), and a full batch-differential
check: the streamed ledger must equal the batch groupBy over the same
records row for row.

Usage: python tools/scale_smoke_urldedup_stream.py [n_records]
       [n_pages] [--rocksdb]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.dedup import normalize_url  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.urldedup_stream import (  # noqa: E402
    stream_url_dedup,
)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rocksdb"]
    n = int(args[0]) if args else 10_000_000
    n_pages = int(args[1]) if len(args) > 1 else 1_000_000
    spark = get_spark("scale-smoke-urldedup-stream")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rocksdb" in sys.argv:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/src"
        # recorded URL: canonical page doc_id % n_pages with the four
        # variant decorations — the stream must collapse them
        page = F.pmod(F.col("doc_id"), F.lit(n_pages))
        url = F.concat(
            F.lit("https://Host"),
            F.pmod(page, F.lit(97)).cast("string"),
            F.lit(".Example.COM/p/"),
            page.cast("string"),
            F.when(F.col("doc_id") % 4 == 1, F.lit("/"))
            .when(F.col("doc_id") % 4 == 2, F.lit("?utm_source=s"))
            .when(F.col("doc_id") % 4 == 3, F.lit("#f"))
            .otherwise(F.lit("")),
        )
        records = (
            spark.range(n)
            .withColumnRenamed("id", "doc_id")
            .withColumn("url", url)
        )
        records.repartition(32).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .parquet(src)
        )
        out = stream_url_dedup(stream, url_col="url")
        sink = f"{tmp}/sink"

        def write_updates(df, batch_id):
            df.write.mode("append").parquet(sink)

        t0 = time.time()
        q = (
            out.writeStream.foreachBatch(write_updates)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        ops = (q.lastProgress or {}).get("stateOperators") or []
        state = "; ".join(
            f"{op.get('operatorName', 'state')}: {op.get('numRowsTotal'):,} rows"
            + (
                f", {op.get('memoryUsedBytes') / 1e6:.1f} MB"
                if op.get("memoryUsedBytes")
                else ""
            )
            for op in ops
        )
        # final ledger = last update per key (counts only grow)
        ledger = (
            spark.read.parquet(sink)
            .groupBy("norm_url")
            .agg(
                F.min("kept_doc_id").alias("kept_doc_id"),
                F.max("n_docs").alias("n_docs"),
            )
        )
        batch = (
            spark.read.parquet(src)
            .select("doc_id", normalize_url(F.col("url")).alias("norm_url"))
            .groupBy("norm_url")
            .agg(
                F.min("doc_id").alias("kept_doc_id"),
                F.count(F.lit(1)).alias("n_docs"),
            )
        )
        n_ledger = ledger.count()
        n_batch = batch.count()
        n_diff = ledger.exceptAll(batch).count() + batch.exceptAll(ledger).count()
        print(
            f"records={n:,} wall={wall:.1f}s rate={n / wall:,.0f} rec/s "
            f"ledger={n_ledger:,} batch={n_batch:,} diff_rows={n_diff} "
            f"state=[{state}]"
        )
        assert n_diff == 0, "stream ledger != batch ledger"

    spark.stop()


if __name__ == "__main__":
    main()
