"""Round-7 scale smoke: LSH near-pair mining at 1M vectors with the
TWO-TIER knob-less derive (derive_lsh_params: planes for occupancy ~4
+ tables sized to hold the occupancy-32 recall) — must recover all
planted duplicates in well under the round-6 single-tier 223 s.

Usage: python tools/scale_smoke_r7.py [n_vec]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext.simsearch import (  # noqa: E402
    _LSH_DIM,
    derive_lsh_params,
    lsh_near_pairs,
)
from meteaudata_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    spark = get_spark("scale-smoke-r7")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # ~0.1% planted near-dups: id and id+offset share a base pattern
    base = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("label"),
        F.expr(
            f"transform(sequence(1, {_LSH_DIM}), "
            f"i -> cast(sin(xxhash64(id % {n_vec - 1000}, i)) as float))"
        ).alias("embedding"),
    )
    tables, planes = derive_lsh_params(n_vec)
    print(f"two-tier derive for {n_vec:,} vectors: {tables} tables x "
          f"{planes} planes (expected occupancy {n_vec / 2**planes:.1f})",
          flush=True)

    t0 = time.perf_counter()
    pairs = lsh_near_pairs(base, threshold=0.9)  # no knobs at all
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    print(f"lsh_near_pairs ({n_vec:,} vectors, two-tier derive): "
          f"{dt:.1f}s, {n_pairs:,} pairs", flush=True)
    # planted dups: the last 1000 ids alias an earlier id exactly
    planted = pairs.filter(
        (F.col("vec_b") >= n_vec - 1000)
        & (F.col("vec_a") == (F.col("vec_b") % (n_vec - 1000)))
    ).count()
    print(f"planted duplicates recovered: {planted}/1000", flush=True)


if __name__ == "__main__":
    main()
