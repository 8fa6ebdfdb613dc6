"""Throughput/state smoke for the streaming semantic near-dup
detector: N synthetic vectors (0.5% exact re-sends) routed through
availableNow micro-batches into per-cluster ring buffers; reports wall
time, vecs/s, and flagged count.

Usage: python tools/scale_smoke_semdedup_stream.py [n_vecs]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.semdedup_stream import (  # noqa: E402
    stream_semantic_dup_candidates,
)
from tools.smoke_guard import ensure_tmp_capacity  # noqa: E402


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    max_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    r_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_dups = n_vecs // 200  # 0.5% re-sent vectors
    dim, n_cent = 64, 64
    # VERDICT r13 #4: fail loudly if /tmp can't hold the run's writes
    # (~dim x 4B float32 + id + parquet overhead per vector) — a
    # nearly-full /tmp measures disk pressure, not the operator
    ensure_tmp_capacity((n_vecs + n_dups) * (dim * 4 + 60))

    spark = get_spark("semdedup-stream-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            grid = (
                (ids[:, None].astype(np.int64) + 1)
                * (np.arange(dim, dtype=np.int64)[None, :] + 7)
                * 2654435761
            ) % 2147483647
            # float32 — the embeddings table's own element type (the
            # detector's ingestion contract quantizes float64 feeds to
            # float32 anyway, so a float64 source just doubles scan bytes)
            base = (((grid % 100_000) / 50_000.0) - 1.0).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in base]}
            )

    originals = (
        spark.range(n_vecs)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
    )
    # re-send the LAST n_dups originals: their representatives are
    # the newest ring entries, so a BOUNDED max_reps still holds
    # them when the copies arrive (the recall-horizon contract)
    resends = originals.filter(F.col("vec_id") >= n_vecs - n_dups).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    tmp = tempfile.mkdtemp(prefix="semdedup_stream_smoke_")
    src = tmp + "/src"
    try:
        # two files with increasing mtimes: originals land (and become
        # representatives) before the re-sent copies arrive
        originals.write.parquet(f"{src}/b0")
        resends.write.parquet(f"{src}/b1")
        import os

        for sub, off in (("b0", -120), ("b1", -60)):
            for f in os.listdir(f"{src}/{sub}"):
                os.utime(f"{src}/{sub}/{f}", (time.time() + off,) * 2)

        schema = spark.read.parquet(f"{src}/b0").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 64)
            .option("latestFirst", "false")
            .parquet(f"{src}/*")
        )
        # centroids from the data's own directions: sample deterministic ids
        samp = originals.filter(F.col("vec_id") % (n_vecs // n_cent) == 0).limit(
            n_cent
        ).collect()
        cents = [(r["vec_id"], r["embedding"]) for r in samp]

        t0 = time.perf_counter()
        out = stream_semantic_dup_candidates(
            stream, cents, threshold=0.999999, max_reps=max_reps,
            intra_cluster_shards=r_shards,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("semdup_smoke")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1200)
        for p in q.recentProgress:
            d = p["durationMs"] if isinstance(p, dict) else p.durationMs
            n_rows = (p["numInputRows"] if isinstance(p, dict) else p.numInputRows)
            print(f"  batch: rows={n_rows:,} durationMs={d}")
        flagged = spark.table("semdup_smoke")
        n_flagged = flagged.count()
        n_planted = flagged.filter(F.col("vec_id") >= 10_000_000).count()
        dt = time.perf_counter() - t0
        total = n_vecs + n_dups
        print(
            f"semdedup-stream {total:,} vecs ({n_dups} re-sends,"
            f" max_reps={max_reps}, R={r_shards}): {dt:.1f} s "
            f"-> {total / dt:,.0f} vecs/s, {n_flagged} flagged "
            f"({n_planted}/{n_dups} planted re-sends caught)"
        )
        assert n_planted == n_dups, (n_planted, n_dups)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
