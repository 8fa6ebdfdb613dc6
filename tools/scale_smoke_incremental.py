"""Round-10 scale smoke: the incremental dedup ledger's delta cost
must follow SHARD size, not CORPUS (store) size.

Builds a synthetic text corpus executor-side, ingests a store of
``n_store`` docs, then measures delta-mining a fixed ``n_shard``-doc
shard against stores of growing size, plus the full recompute at the
largest corpus for contrast.

Usage: python tools/scale_smoke_incremental.py [n_store] [n_shard]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext import dedup  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def _synth_docs(spark, n, offset=0):
    # 9-token pseudo-random texts keyed on the GLOBAL doc_id; every
    # 100th doc is an exact dup of its predecessor (planted pairs)
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        F.expr(
            f"array_join(transform(sequence(1, 9), "
            f"i -> conv(cast(abs(xxhash64("
            f"CASE WHEN (id + {offset}) % 100 = 0 THEN id + {offset} - 1 "
            f"ELSE id + {offset} END, i)) as string), 10, 36)), ' ')"
        ).alias("text"),
    )


def main() -> None:
    n_store = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_shard = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    spark = get_spark("scale-smoke-incremental")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for frac in (0.25, 0.5, 1.0):
        ns = int(n_store * frac)
        store_docs = _synth_docs(spark, ns)
        t0 = time.perf_counter()
        _, store = dedup.incremental_minhash_pairs(None, store_docs)
        store.count()  # materialize the persisted store
        t_ingest = time.perf_counter() - t0

        shard = _synth_docs(spark, n_shard, offset=ns)
        t0 = time.perf_counter()
        delta, _ = dedup.incremental_minhash_pairs(store, shard)
        n_pairs = delta.count()
        t_delta = time.perf_counter() - t0
        print(
            f"store={ns:>7,}  shard={n_shard:,}  ingest={t_ingest:6.1f}s  "
            f"delta={t_delta:6.1f}s  delta_pairs={n_pairs}",
            flush=True,
        )

    full_docs = _synth_docs(spark, n_store + n_shard)
    t0 = time.perf_counter()
    n_full = dedup.minhash_lsh_pairs(full_docs).count()
    t_full = time.perf_counter() - t0
    print(f"full recompute at {n_store + n_shard:,} docs: {t_full:6.1f}s "
          f"({n_full} pairs)", flush=True)


if __name__ == "__main__":
    main()
