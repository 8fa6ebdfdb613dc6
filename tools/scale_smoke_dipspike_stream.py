"""10M-event throughput smoke for the streaming dip/spike detector
(``streaming/dipspike_stream.py``) — the CEP-style pattern matcher's
100 TB questions: events/s through the applyInPandasWithState stage,
and whether state really is TWO points per live series regardless of
history length (numRowsTotal == n_series).

Design: 200k (user, type) series; per-series values cycle
100, 100, 10, 100 — every 4th interior point is a 25%-fence dip, so
the expected flag count is exact and verifies the pipeline end to
end at scale, not just wall clock.

Usage: python tools/scale_smoke_dipspike_stream.py [n_events] [--rocksdb]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.dipspike_stream import (  # noqa: E402
    stream_dip_spike,
)


def _state_summary(q) -> str:
    try:
        ops = (q.lastProgress or {}).get("stateOperators") or []
        parts = []
        for op in ops:
            rows = op.get("numRowsTotal")
            mem = op.get("memoryUsedBytes")
            parts.append(
                f"{op.get('operatorName', 'state')}: {rows:,} rows"
                + (f", {mem / 1e6:.1f} MB" if mem else "")
            )
        return "; ".join(parts) if parts else "n/a"
    except Exception:  # noqa: BLE001 - metrics are best-effort
        return "n/a"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rocksdb"]
    n = int(args[0]) if args else 10_000_000
    n_series = 200_000
    spark = get_spark("scale-smoke-dipspike")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rocksdb" in sys.argv:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp()

    # 200k series = 40k users x 5 types (series_id = id % 200k,
    # user = series_id % 40k, type = series_id div 40k — type must NOT
    # be a function of user alone or the keyspace collapses); event k
    # of a series at minute k; value cycle (100, 100, 10, 100) puts a
    # dip at every k % 4 == 2 interior point and nothing else
    src = f"{tmp}/events"
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_series % 40_000).alias("user_id"),
        F.concat(
            F.lit("t"), (F.col("id") % n_series / 40_000).cast("int")
        ).alias("event_type"),
        F.expr(
            f"timestamp '2024-06-01' + make_interval(0,0,0,0,0,"
            f"cast(id div {n_series} as int),0)"
        ).alias("ts"),
        F.when((F.expr(f"id div {n_series}") % 4) == 2, 10.0)
        .otherwise(100.0)
        .alias("value"),
    )
    ev.write.mode("overwrite").parquet(src)
    per_series = n // n_series

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_dip_spike(stream)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/dip_out")
        .option("checkpointLocation", f"{tmp}/dip_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    out = spark.read.parquet(f"{tmp}/dip_out")
    n_out = out.count()
    n_dips = out.filter("is_dip").count()
    # interior points per series = per_series - 2; dips at positions
    # k % 4 == 2 with 1 <= k <= per_series - 2
    exp_dips = n_series * len(
        [k for k in range(1, per_series - 1) if k % 4 == 2]
    )
    exp_out = n_series * max(per_series - 2, 0)
    print(
        f"stream dip/spike: {n:,} events in {dt:.1f}s "
        f"({n / dt:,.0f} events/s); {n_out:,} interior rows "
        f"(expected {exp_out:,}), {n_dips:,} dips "
        f"(expected {exp_dips:,}); state [{_state_summary(q)}]",
        flush=True,
    )
    assert n_out == exp_out, (n_out, exp_out)
    assert n_dips == exp_dips, (n_dips, exp_dips)
    q.stop()


if __name__ == "__main__":
    main()
