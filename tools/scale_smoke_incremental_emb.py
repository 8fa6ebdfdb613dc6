"""Round-11 scale smoke: the EMBEDDING incremental ledger's delta
cost must follow SHARD size, not STORE size (VERDICT r10 #5's "delta
cost ∝ shard size" contract — the SemDeDup analog of
tools/scale_smoke_incremental.py).

Builds synthetic vectors executor-side (deterministic hash grid, 64
dims), opens the ledger with stores of growing size, then delta-mines
a FIXED-size shard against each store and reports wall seconds —
flat-ish delta time while the store quadruples is the pass
criterion.  The k ∝ n cluster sizing (semdedup_n_clusters) is what
keeps within-cluster pair volume linear; the smoke derives k from the
FINAL corpus size so every store tier uses the same frozen codebook
(the ledger's composability contract).

Usage: python tools/scale_smoke_incremental_emb.py [n_store] [n_shard]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.simsearch import (  # noqa: E402
    _l2_assign_fast,
    _norm_expr,
    _q64,
    incremental_semdedup_pairs,
    semdedup_n_clusters,
)
from meteaudata_spark.session import get_spark  # noqa: E402


def _synth_vecs(spark, n, offset=0, dim=64):
    # deterministic per-(vec, dim) hash grid in [-1, 1); every 200th
    # vector is an exact copy of its predecessor (planted dups)
    base = (
        f"CASE WHEN (id + {offset}) % 200 = 0 THEN id + {offset} - 1 "
        f"ELSE id + {offset} END"
    )
    return spark.range(n).select(
        (F.col("id") + offset).alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}), i -> "
            f"cast((abs(xxhash64({base}, i)) % 100000) / 50000.0 - 1.0"
            f" as double))"
        ).alias("embedding"),
    )


def main() -> None:
    n_store = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_shard = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    spark = get_spark("scale-smoke-incremental-emb")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # frozen codebook from the FINAL corpus size: first n_cent vectors
    n_cent = semdedup_n_clusters(n_store + n_shard)
    cents_df = _synth_vecs(spark, n_cent).select(
        "vec_id", _q64("embedding").alias("qe")
    )
    cents = [(r["vec_id"], r["qe"]) for r in cents_df.collect()]

    out = {"n_shard": n_shard, "n_clusters": n_cent, "tiers": []}
    for frac in (0.25, 0.5, 1.0):
        ns = int(n_store * frac)
        store_vecs = _synth_vecs(spark, ns)
        q = store_vecs.select(
            "vec_id", "embedding", _q64("embedding").alias("qe")
        )
        store = (
            _l2_assign_fast(q, cents)
            .withColumn("nrm", F.expr(_norm_expr("embedding")))
            .persist()
        )
        store.count()  # materialize: the persisted historical store
        shard = _synth_vecs(spark, n_shard, offset=ns)
        dt, n_pairs = 9e9, -1
        for _ in range(2):  # min-of-2: Arrow-worker warmup noise
            t0 = time.perf_counter()
            delta, _all = incremental_semdedup_pairs(store, shard, cents)
            n_pairs = delta.count()
            dt = min(dt, round(time.perf_counter() - t0, 2))
        out["tiers"].append(
            {"store": ns, "delta_sec": dt, "delta_pairs": n_pairs}
        )
        print(f"store={ns:>8,}  delta={dt:6.2f} s  pairs={n_pairs}")
        store.unpersist()

    t = out["tiers"]
    ratio = t[-1]["delta_sec"] / max(t[0]["delta_sec"], 1e-9)
    out["delta_ratio_4x_store"] = round(ratio, 2)
    out["ok"] = ratio < 2.5  # store 4x, delta must stay near-flat
    print(json.dumps(out))
    assert out["ok"], out


if __name__ == "__main__":
    main()
