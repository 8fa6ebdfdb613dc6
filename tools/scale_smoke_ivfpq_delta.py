"""Round-13 scale smoke: incremental IVF-PQ index maintenance
(VERDICT r12 #7) — appending a vector delta to a persisted index must
cost O(delta), not O(index): the append encodes ONLY the delta
against the frozen codebooks and writes delta-sized parquet, while a
full rebuild re-encodes and rewrites the whole corpus.

Builds the index from the sf tier's embeddings replicated ``mult``×
(key-shifted, past the training/query id ranges so the base semantics
are unchanged), then times (a) full rebuild at each store size vs (b)
appending a FIXED-size delta.  Pass criterion: delta time stays flat
while the store grows, and delta ≪ rebuild at the largest tier.
Search-result equivalence is asserted at every tier (delta-appended
index == full rebuild, same top-k).

Usage: python tools/scale_smoke_ivfpq_delta.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.simsearch import (  # noqa: E402
    append_ivfpq_delta,
    build_ivfpq_index,
    ivfpq_search,
)
from meteaudata_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "bench_results/scale_smoke_ivfpq_delta.json"
    )
    spark = get_spark("ivfpq-delta-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n0 = emb.count()
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    queries = emb.filter(F.col("vec_id") < 3)

    def store(mult: int):
        # replicate with key shifts PAST the training/query id ranges
        # so codebooks and queries are identical across tiers
        parts = [emb]
        for k in range(1, mult):
            parts.append(
                emb.select(
                    (F.col("vec_id") + k * (max_id + 1)).alias("vec_id"),
                    "embedding",
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        return d

    # fixed-size delta: one extra replica shard (same size every tier)
    delta = emb.select(
        (F.col("vec_id") + 1_000_000_000).alias("vec_id"), "embedding"
    )

    tiers = []
    tmp = tempfile.mkdtemp(prefix="ivfpq_smoke_")
    try:
        for mult in (8, 32, 128):
            base = store(mult)
            full_path = f"{tmp}/full_{mult}"
            inc_path = f"{tmp}/inc_{mult}"

            t0 = time.perf_counter()
            build_ivfpq_index(base.unionByName(delta), full_path)
            rebuild_sec = round(time.perf_counter() - t0, 2)

            build_ivfpq_index(base, inc_path)
            t0 = time.perf_counter()
            append_ivfpq_delta(spark, inc_path, delta)
            delta_sec = round(time.perf_counter() - t0, 2)

            got = [
                tuple(r)
                for r in ivfpq_search(spark, inc_path, queries).collect()
            ]
            want = [
                tuple(r)
                for r in ivfpq_search(spark, full_path, queries).collect()
            ]
            assert got == want, f"mult={mult}: delta index != rebuild"
            tiers.append(
                {
                    "store_rows": n0 * mult,
                    "delta_rows": n0,
                    "rebuild_sec": rebuild_sec,
                    "delta_append_sec": delta_sec,
                    "speedup": round(rebuild_sec / max(delta_sec, 1e-9), 1),
                    "search_equivalent": True,
                }
            )
            print(tiers[-1])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    rec = {
        "purpose": "VERDICT r12 #7: IVF-PQ delta append costs O(delta), not O(index)",
        "sf_dir": sf_dir,
        "tiers": tiers,
        "pass": all(
            t["search_equivalent"]
            and t["delta_append_sec"] < t["rebuild_sec"]
            for t in tiers
        ),
    }
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"pass": rec["pass"], "out": out_json}))
    spark.stop()


if __name__ == "__main__":
    main()
