"""Streaming segment-dedup throughput smoke at 10M segments
(VERDICT r10 #8): 1.25M synthetic docs x 8 segments (7 unique + 1
shared boilerplate segment per doc) through ``stream_segment_dedup``
in availableNow micro-batches, sharded-state idiom, with EXACT
planted-output counts: every unique segment kept, the boilerplate
segment kept exactly once across the whole stream.

Usage: python tools/scale_smoke_segdedup_stream.py [n_docs]
       [segs_per_doc]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.segdedup_stream import (  # noqa: E402
    stream_segment_dedup,
)

_BP = " ".join(f"bp{t}" for t in range(8))  # the shared 8-word segment


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_250_000
    segs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("segdedup-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            texts = []
            for i in ids:
                parts = []
                for j in range(segs):
                    if j == 3:
                        parts.append(_BP)  # boilerplate at seg_idx 3
                    else:
                        parts.append(
                            " ".join(f"w{i}_{j}_{t}" for t in range(8))
                        )
                texts.append(" ".join(parts))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    docs = (
        spark.range(n_docs)
        .repartition(32)
        .mapInPandas(gen, "doc_id long, text string")
    )
    src = tempfile.mkdtemp() + "/src"
    docs.write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(src)
    )
    t0 = time.perf_counter()
    out = stream_segment_dedup(stream, seg_words=8)
    sink = tempfile.mkdtemp() + "/sink"

    def write_kept(df, _bid):
        df.write.mode("append").parquet(sink)

    q = (
        out.writeStream.foreachBatch(write_kept)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    dt = time.perf_counter() - t0
    kept = spark.read.parquet(sink)
    n_kept = kept.count()
    n_bp = kept.filter(F.col("segment") == _BP).count()
    prog = q.lastProgress
    state_rows = (
        prog["stateOperators"][0]["numRowsTotal"]
        if prog and prog.get("stateOperators")
        else -1
    )
    n_segments = n_docs * segs
    expected_kept = n_docs * (segs - 1) + 1
    ok = n_kept == expected_kept and n_bp == 1
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_segments": n_segments,
                "sec": round(dt, 1),
                "segments_per_sec": int(n_segments / dt),
                "n_kept": n_kept,
                "expected_kept": expected_kept,
                "boilerplate_kept": n_bp,
                "state_shard_rows": state_rows,
                "ok": ok,
            }
        )
    )
    assert ok, (n_kept, expected_kept, n_bp)


if __name__ == "__main__":
    main()
