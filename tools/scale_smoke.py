"""Scale smoke: run the core kernels on 10M+ synthetic rows generated
executor-side (spark.range — no driver materialization) and print
timings.  Evidence that the partition strategies hold at 100× the
bench scale factor; results recorded in SCALE.md.

Usage: python tools/scale_smoke.py [n_rows] [n_keys]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.operators import kernels  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # long multi-series table: n_keys series, 1-second spacing, ~5% nulls
    base = (
        spark.range(n_rows)
        .select(
            (F.col("id") % n_keys).cast("string").alias("series_name"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") / n_keys).cast("long")
            ).alias("timestamp"),
            F.when(F.pmod(F.xxhash64("id"), F.lit(20)) == 0, F.lit(None))
            .otherwise(F.sin(F.col("id") / 1000.0))
            .alias("value"),
        )
        .repartition(64, "series_name")
        .persist()
    )
    print(f"rows: {base.count():,} keys: {n_keys}", flush=True)

    results = {}

    t0 = time.perf_counter()
    kernels.resample_mean(
        base, "1min", partition_cols=["series_name"]
    ).write.mode("overwrite").format("noop").save()
    results["resample_1min_partitioned"] = round(time.perf_counter() - t0, 2)
    print("resample:", results["resample_1min_partitioned"], "s", flush=True)

    t0 = time.perf_counter()
    kernels.interpolate_linear(
        base, partition_cols=["series_name"]
    ).write.mode("overwrite").format("noop").save()
    results["interpolate_partitioned"] = round(time.perf_counter() - t0, 2)
    print("interpolate:", results["interpolate_partitioned"], "s", flush=True)

    # one giant unpartitioned series: the distributed-interpolation path
    single = base.filter(F.col("series_name") == "0").select(
        "timestamp", "value"
    )
    t0 = time.perf_counter()
    kernels.interpolate_linear_distributed(
        single, chunk_seconds=3600.0
    ).write.mode("overwrite").format("noop").save()
    results["interpolate_distributed_single_series"] = round(
        time.perf_counter() - t0, 2
    )
    print(
        "distributed interp (1 series,",
        f"{n_rows // n_keys:,} rows):",
        results["interpolate_distributed_single_series"], "s", flush=True,
    )

    t0 = time.perf_counter()
    kernels.ewma_distributed(
        single, chunk_seconds=3600.0
    ).write.mode("overwrite").format("noop").save()
    results["ewma_distributed_single_series"] = round(
        time.perf_counter() - t0, 2
    )
    print(
        "distributed ewma (1 series,",
        f"{n_rows // n_keys:,} rows):",
        results["ewma_distributed_single_series"], "s", flush=True,
    )

    t0 = time.perf_counter()
    kernels.rolling_mean(
        base, 10, partition_cols=["series_name"]
    ).write.mode("overwrite").format("noop").save()
    results["rolling_mean_partitioned"] = round(time.perf_counter() - t0, 2)
    print("rolling mean:", results["rolling_mean_partitioned"], "s", flush=True)

    # LSH bucketize: n_rows/10 synthetic 64-dim vectors, built
    # executor-side; the stage must stay a narrow shuffle-free map
    from meteaudata_spark.ext import simsearch

    n_vec = n_rows // 10
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 10).cast("int").alias("label"),
        F.expr(
            "transform(sequence(0, 63), i -> cast(sin(id * 64 + i) as float))"
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    simsearch.lsh_bucketize(vecs).write.mode("overwrite").format("noop").save()
    results["lsh_bucketize_vectors"] = round(time.perf_counter() - t0, 2)
    print(
        f"lsh bucketize ({n_vec:,} x 64-dim):",
        results["lsh_bucketize_vectors"], "s", flush=True,
    )

    # MinHash+LSH dedup ladder: n_rows/100 synthetic 20-word docs
    # (500-word vocab, ~3% exact-dup pairs via modular id reuse)
    from meteaudata_spark.ext import dedup

    n_docs = n_rows // 100
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 19), "
            "i -> concat('w', pmod(xxhash64("
            "IF(pmod(id, 33) = 0, id + 1, id) * 20 + i), 500))), ' ')"
        ).alias("text"),
    )
    t0 = time.perf_counter()
    n_pairs = dedup.minhash_lsh_pairs(docs).count()
    results["minhash_lsh_docs"] = round(time.perf_counter() - t0, 2)
    print(
        f"minhash+lsh dedup ({n_docs:,} docs, {n_pairs:,} pairs):",
        results["minhash_lsh_docs"], "s", flush=True,
    )

    # relational kernel: Q1-shaped decimal aggregation + broadcast-dim
    # join over n_rows synthetic fact rows (all generated executor-side)
    n_dim = max(1000, n_rows // 100)
    fact = spark.range(n_rows).select(
        (F.col("id") % n_dim).alias("fk"),
        F.pmod(F.xxhash64("id"), F.lit(5)).alias("flag"),
        (
            (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100000)) / 100.0)
        ).cast("decimal(18,2)").alias("price"),
        (
            (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(10)) / 100.0)
        ).cast("decimal(18,2)").alias("disc"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("fk"),
        F.pmod(F.xxhash64(F.col("id") + 3), F.lit(25)).alias("grp"),
    )
    rev = F.col("price") * (F.lit(1).cast("decimal(18,2)") - F.col("disc"))
    t0 = time.perf_counter()
    (
        fact.join(F.broadcast(dim), "fk")
        .select("flag", "grp", rev.alias("__rev"))
        .groupBy("flag", "grp")
        .agg(F.sum("__rev").alias("revenue"), F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    results["relational_bcast_join_agg"] = round(time.perf_counter() - t0, 2)
    print(
        f"relational join+agg ({n_rows:,} fact x {n_dim:,} dim):",
        results["relational_bcast_join_agg"], "s", flush=True,
    )

    import json

    print(json.dumps({"n_rows": n_rows, "n_keys": n_keys, "timings_sec": results}))


if __name__ == "__main__":
    main()
