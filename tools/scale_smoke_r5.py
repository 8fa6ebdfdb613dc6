"""Scale smoke for the round-5 operators: the distributed global rank
(vs. the single-task window it replaces) and the distributed LSH
near-pair join.  Synthetic inputs generated executor-side
(spark.range); results recorded in SCALE.md.

Usage: python tools/scale_smoke_r5.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.operators.rank import global_rank, ntile_from_rank  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def _timed(name: str, df, results: dict) -> None:
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    results[name] = dt
    print(f"{name}: {dt:.1f}s ({n:,} output rows)", flush=True)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000

    spark = get_spark("scale-smoke-r5")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict = {}

    # deterministic pseudo-random revenue per key, executor-side
    rows = spark.range(n_rows).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 1_000_000).cast("double").alias("v"),
    )

    # --- distributed global rank + ntile ------------------------------
    ranked = global_rank(
        rows, "v", ascending=False, tiebreak_cols=["id"], n_buckets=256,
        out_col="__rank",
    )
    total = rows.agg(F.count(F.lit(1)).alias("__n"))
    quart = (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("q", ntile_from_rank(F.col("__rank"), F.col("__n"), 4))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v"), F.max("v"))
    )
    _timed(f"global_rank+ntile ({n_rows:,} rows, 256 buckets)", quart, results)

    # --- the single-task window it replaces (smaller n: it can't keep up)
    n_win = min(n_rows, 10_000_000)
    small = rows.limit(n_win)
    w = Window.orderBy(F.col("v").desc(), F.col("id"))
    quart_win = (
        small.withColumn("q", F.ntile(4).over(w))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v"), F.max("v"))
    )
    _timed(f"single-window ntile ({n_win:,} rows, ONE task)", quart_win, results)

    # --- distributed LSH near-pair mining, 1M synthetic vectors ------
    # vectors generated executor-side; ~0.1% planted near-dups (id and
    # id+offset share a base pattern) give the verify stage real work
    from meteaudata_spark.ext.simsearch import _LSH_DIM, lsh_near_pairs

    n_vec = 1_000_000
    base = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("label"),
        F.expr(
            f"transform(sequence(1, {_LSH_DIM}), "
            f"i -> cast(sin(xxhash64(id % {n_vec - 1000}, i)) as float))"
        ).alias("embedding"),
    )
    # 18 planes → ~4 vectors/bucket at 1M: pair generation stays linear.
    # The gate's 4-plane default is recall-tuned for the small oracle
    # corpus and would put ~60k vectors in every bucket here (quadratic
    # blowup — measured: does not finish).  Plane count is THE
    # occupancy knob a real deployment sizes to its corpus.
    pairs = lsh_near_pairs(base, threshold=0.9, n_planes=18)
    _timed(f"lsh_near_pairs ({n_vec:,} vectors, 18 planes)", pairs, results)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
