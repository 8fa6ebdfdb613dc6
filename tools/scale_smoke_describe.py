"""1B-row single-series describe() smoke (VERDICT r10 #7): the
spacing deltas must compute through per-chunk windows — no
single-partition window stage over the data — so one huge
unpartitioned series summarizes in parallel.

Usage: python tools/scale_smoke_describe.py [--rows 1000000000]
       [--chunk-seconds 86400]

Prints one JSON line: rows, wall seconds, rows/s, the summary dict,
and the count of timestamp-ordered window specs that are NOT
partitioned by __chunk (must be 0).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000_000)
    ap.add_argument("--chunk-seconds", type=float, default=86400.0)
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from meteaudata_spark.functions.epoch import epoch_seconds
    from meteaudata_spark.session import get_spark
    from meteaudata_spark.timeseries import TimeSeries

    spark = get_spark("describe-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # one series: 1 Hz ticks from 2000-01-01, every 1000th value NaN,
    # one duplicate timestamp planted per 10M rows
    base = spark.range(args.rows).select(
        F.timestamp_seconds(F.lit(946684800) + F.col("id")).alias(
            "timestamp"
        ),
        F.when(F.pmod("id", F.lit(1000)) == 0, F.lit(float("nan")))
        .otherwise(F.col("id").cast("double"))
        .alias("value"),
    )
    ts = TimeSeries(df=base, name="huge")

    # plan proof: rebuild the delta relation describe() aggregates and
    # assert every timestamp-ordered window is __chunk-partitioned
    chunked = base.withColumn(
        "__e", epoch_seconds(F.col("timestamp"))
    ).withColumn(
        "__chunk", F.floor(F.col("__e") / F.lit(args.chunk_seconds))
    )
    bounds = chunked.groupBy("__chunk").agg(F.max("__e").alias("__last_e"))
    carry = bounds.select(
        "__chunk",
        F.lag("__last_e").over(Window.orderBy("__chunk")).alias("__p"),
    )
    w = Window.partitionBy("__chunk").orderBy("timestamp")
    plan = (
        chunked.join(F.broadcast(carry), "__chunk", "left")
        .withColumn(
            "__delta",
            F.col("__e") - F.coalesce(F.lag("__e").over(w), F.col("__p")),
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    bad = [
        spec
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if "timestamp" in spec and not spec.strip().startswith("__chunk")
    ]

    t0 = time.perf_counter()
    stats = ts.describe(chunk_seconds=args.chunk_seconds)
    dt = time.perf_counter() - t0

    ok = (
        stats["n_rows"] == args.rows
        and stats["median_spacing_seconds"] == 1.0
        and stats["n_missing"] == (args.rows + 999) // 1000
        and not bad
    )
    print(
        json.dumps(
            {
                "rows": args.rows,
                "sec": round(dt, 1),
                "rows_per_sec": int(args.rows / dt),
                "median_spacing_seconds": stats["median_spacing_seconds"],
                "n_missing": stats["n_missing"],
                "n_duplicate_index": stats["n_duplicate_index"],
                "unpartitioned_ts_windows": len(bad),
                "ok": ok,
            }
        )
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
