"""Round-14 scale smoke: STREAMING IVF-PQ ingestion (VERDICT r13 #5)
— `stream_append_ivfpq` must hold a FLAT per-batch cost while the
index grows: each micro-batch pays O(batch) encode + append (plus the
slim vec_id idempotency scan), never O(index) re-encode.

Builds a base index from the sf tier's embeddings, then streams
``n_batches`` fixed-size batches (sf embeddings replicated and
key-shifted per batch, ~``mult``x each) through foreachBatch append.
Records per-batch trigger durations from the query progress log and
checks (a) the stream-built index answers the gate queries exactly
like a batch rebuild over the same vectors, (b) the tail batches cost
no more than ``flat_ratio``x the head batches (flat profile).

Usage: python tools/scale_smoke_ivfpq_stream.py [sf_dir] [n_batches]
       [mult] [out_json]
Defaults stream 10 x 1M = 10M vectors at sf0.1 (10k base vectors).
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.simsearch import (  # noqa: E402
    build_ivfpq_index,
    ivfpq_search,
)
from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.ivfpq_stream import (  # noqa: E402
    stream_append_ivfpq,
)
from tools.smoke_guard import ensure_tmp_capacity  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    out_json = (
        sys.argv[4]
        if len(sys.argv) > 4
        else "bench_results/scale_smoke_ivfpq_stream.json"
    )
    spark = get_spark("ivfpq-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    batch_rows = n0 * mult
    total_rows = batch_rows * n_batches
    # source parquet (~64 floats + id per row, ~150 B on disk) +
    # 8 slim code rows per vector in the index (~40 B) + base index
    ensure_tmp_capacity(total_rows * 200)

    queries = emb.filter(F.col("vec_id") < 3)
    tmp = tempfile.mkdtemp(prefix="ivfpq_stream_smoke_")
    try:
        # lay out n_batches source files, each one replicated shard,
        # ids shifted past every training/query range and disjoint
        # across batches
        src = f"{tmp}/src"
        for b in range(n_batches):
            shard = None
            for k in range(mult):
                off = 1_000_000_000 + (b * mult + k) * (max_id + 1)
                part = emb.select(
                    (F.col("vec_id") + off).alias("vec_id"), "embedding"
                )
                shard = part if shard is None else shard.unionByName(part)
            shard.coalesce(1).write.mode("append").parquet(src)
        src_files = [
            f
            for f in spark.read.parquet(src).inputFiles()
        ]
        assert len(src_files) >= n_batches

        inc_idx = f"{tmp}/inc"
        build_ivfpq_index(emb, inc_idx)

        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = stream_append_ivfpq(stream, inc_idx, f"{tmp}/ckpt")
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = [
            p
            for p in q.recentProgress
            if p and p.get("numInputRows", 0) > 0
        ]
        durs = [p["durationMs"]["triggerExecution"] / 1e3 for p in prog]
        head = statistics.median(durs[1:4]) if len(durs) >= 4 else durs[0]
        tail = statistics.median(durs[-3:])
        flat_ratio = round(tail / max(head, 1e-9), 2)

        # equivalence: stream-built == batch rebuild on the gate rows
        full_idx = f"{tmp}/full"
        build_ivfpq_index(
            spark.read.parquet(src).unionByName(emb), full_idx
        )
        got = [
            tuple(r) for r in ivfpq_search(spark, inc_idx, queries).collect()
        ]
        want = [
            tuple(r) for r in ivfpq_search(spark, full_idx, queries).collect()
        ]
        assert got == want, "stream-built index != batch rebuild"
        n_codes = spark.read.parquet(f"{inc_idx}/codes").count()
        assert n_codes == (total_rows + n0) * 8, n_codes
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    rec = {
        "purpose": (
            "VERDICT r13 #5: streaming IVF-PQ ingestion — flat per-batch "
            "cost, stream-built == batch rebuild"
        ),
        "sf_dir": sf_dir,
        "streamed_rows": total_rows,
        "n_batches": len(durs),
        "batch_rows": batch_rows,
        "wall_sec": round(wall, 1),
        "rows_per_sec": int(total_rows / wall),
        "per_batch_sec": [round(d, 2) for d in durs],
        "head_median_sec": round(head, 2),
        "tail_median_sec": round(tail, 2),
        "tail_over_head": flat_ratio,
        "pass": flat_ratio <= 2.0,
        "search_equivalent": True,
    }
    print(json.dumps(rec))
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
