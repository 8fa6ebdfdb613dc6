"""Scale smoke for the round-2 operators: synthetic inputs generated
executor-side (spark.range — nothing materialized on the driver),
timed at 10–100× the bench scale factor.  Results recorded in
SCALE.md.

Usage: python tools/scale_smoke_r2.py [n_rows]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.ext import corpus_ops, sketches  # noqa: E402
from meteaudata_spark.ext.simsearch import kmeans_refine  # noqa: E402
from meteaudata_spark.session import get_spark  # noqa: E402


def _timed(name: str, df, results: dict) -> None:
    t0 = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - t0
    results[name] = dt
    print(f"{name}: {dt:.1f}s ({n:,} output rows)", flush=True)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    spark = get_spark("scale-smoke-r2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    results: dict = {}

    # --- hash split: map-only over n_rows ids ---------------------------
    ids = spark.range(n_rows).withColumnRenamed("id", "doc_id")
    split = corpus_ops.hash_split(ids).groupBy("split").count()
    _timed(f"hash_split {n_rows:,} rows", split, results)

    # --- HLL distinct over n_rows hashed tokens, 5 groups ---------------
    toks = spark.range(n_rows).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.pmod(F.xxhash64((F.col("id") % (n_rows // 2)).cast("string")), F.lit(1 << 60)).alias("h"),
    )
    _timed(f"hll_distinct {n_rows:,} tokens", sketches.hll_distinct(toks, "grp"), results)

    # --- contamination: n_docs synthetic docs vs a 1k-doc benchmark -----
    n_docs = max(n_rows // 100, 10_000)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(0, 39), "
            "i -> concat('w', pmod(xxhash64(CAST(id + i AS STRING)), 500))), ' ')"
        ).alias("text"),
    )
    cont = corpus_ops.contamination(
        docs.filter(F.col("doc_id") >= 1000), docs.filter(F.col("doc_id") < 1000)
    )
    _timed(f"contamination {n_docs:,} docs", cont, results)

    # --- PII scrub: map-only regex over n_docs docs ---------------------
    pii = corpus_ops.scrub_pii(
        docs.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(" user"),
                F.col("doc_id").cast("string"),
                F.lit("@ex.com +1-555-0000"),
            ),
        )
    ).selectExpr("sum(n_emails) AS e", "sum(n_phones) AS p")
    _timed(f"pii_scrub {n_docs:,} docs", pii, results)

    # --- k-means refinement over n_vecs 64-dim synthetic embeddings -----
    n_vecs = max(n_rows // 10, 100_000)
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), "
            "i -> CAST(sin(CAST(id AS DOUBLE) * i / 97.0) AS FLOAT))"
        ).alias("embedding"),
        (F.col("id") % 10).alias("label"),
    )
    _timed(f"kmeans_refine {n_vecs:,} vecs", kmeans_refine(emb), results)

    total = sum(results.values())
    print(f"TOTAL {total:.1f}s for {len(results)} operators", flush=True)


if __name__ == "__main__":
    main()
