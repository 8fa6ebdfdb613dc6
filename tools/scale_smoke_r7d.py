"""Round-7 part d: scale smokes for multi-touch attribution and
event-trigram mining.

Usage: python tools/scale_smoke_r7d.py [n_events]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-smoke-r7d")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp()

    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        # event k of a user lands ~10 min after its predecessor, so a
        # purchase sees ~6 in-window clicks (k = id div 200000)
        F.expr(
            "timestamp '2024-05-01' + make_interval(0,0,0,0,0,0,"
            "cast((id div 200000) * 600 + (id % 13) * 37 as int))"
        ).alias("ts"),
        (F.col("id") % 200_000).alias("user_id"),
        # id%5 would assign each user ONE type (200000 is a multiple
        # of 5); mix the per-user sequence number in instead
        F.when((F.expr("(id div 200000) + id") % 5) < 3, "click")
        .when((F.expr("(id div 200000) + id") % 5) == 3, "view")
        .otherwise("purchase")
        .alias("event_type"),
        ((F.col("id") % 97) / 3.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")

    from meteaudata_spark.ext.timeseries_queries import (
        ts_attribution_weights,
        ts_event_trigrams,
    )

    t0 = time.perf_counter()
    n_credits = ts_attribution_weights(spark, tmp).count()
    dt = time.perf_counter() - t0
    print(
        f"attribution: {n:,} events in {dt:.1f}s ({n / dt:,.0f} events/s), "
        f"{n_credits:,} credited clicks",
        flush=True,
    )

    t0 = time.perf_counter()
    top = ts_event_trigrams(spark, tmp).collect()
    dt = time.perf_counter() - t0
    print(
        f"trigrams: {n:,} events in {dt:.1f}s ({n / dt:,.0f} events/s), "
        f"top sequence {top[0]['e1']}>{top[0]['e2']}>{top[0]['e3']} "
        f"x{top[0]['n']:,}",
        flush=True,
    )


if __name__ == "__main__":
    main()
