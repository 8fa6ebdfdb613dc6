"""Round-9 streaming throughput smokes (VERDICT r8 #9): the two
streaming operators without 10M-event rows in SCALE.md —
``stream_sessionize`` (native session_window) and
``stream_attribution`` (watermarked stream⋈stream join) — driven
through availableNow micro-batches; reports wall time, events/s,
result counts, and the STATE-SIZE bound from the query's final
progress (numRowsTotal / memory), which is the 100 TB question for a
stateful operator.

Usage: python tools/scale_smoke_r9_streams.py [n_events]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from meteaudata_spark.session import get_spark  # noqa: E402
from meteaudata_spark.streaming.attribution_stream import (  # noqa: E402
    stream_attribution,
)
from meteaudata_spark.streaming.sessionize_stream import (  # noqa: E402
    stream_sessionize,
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
    n_users = 200_000
    spark = get_spark("scale-smoke-r9-streams")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rocksdb" in sys.argv:
        # the 100 TB state path: off-heap RocksDB instead of the
        # HDFS-backed in-memory map (measured: same throughput,
        # ~6.5× less state memory for the 200k-session workload)
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.mkdtemp()

    # --- sessionize: per-user event k at minute 13k + 35*(k div 2):
    # gaps alternate 13 / 48 min, so sessions are event PAIRS closed
    # by each 48-min gap (> 30-min session gap) — exact expected
    # closed-session count = (events_per_user div 2 - 1 + odd tail)
    # per user, the same design as the 1M r7c smoke.
    src = f"{tmp}/events"
    ev = spark.range(n).select(
        (F.col("id") % n_users).alias("user_id"),
        F.expr(
            f"timestamp '2024-05-01' + make_interval(0,0,0,0,0,"
            f"cast((id div {n_users}) * 13 + ((id div {n_users}) div 2) * 35 "
            "as int),0)"
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        stream_sessionize(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", f"{tmp}/sess_out")
        .option("checkpointLocation", f"{tmp}/sess_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n_sessions = spark.read.parquet(f"{tmp}/sess_out").count()
    print(
        f"stream sessionize: {n:,} events in {dt:.1f}s "
        f"({n / dt:,.0f} events/s), {n_sessions:,} closed sessions; "
        f"state [{_state_summary(q)}]",
        flush=True,
    )
    q.stop()

    # --- attribution: r7d's batch data design (user event every
    # ~10 min, per-user-sequence type mixing so every user has both
    # clicks and purchases), split into two streams of the SAME
    # parquet source, joined with 1h window / 2h watermarks.
    src2 = f"{tmp}/events2"
    ev2 = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.expr(
            f"timestamp '2024-05-01' + make_interval(0,0,0,0,0,0,"
            f"cast((id div {n_users}) * 600 + (id % 13) * 37 as int))"
        ).alias("ts"),
        (F.col("id") % n_users).alias("user_id"),
        F.when((F.expr(f"(id div {n_users}) + id") % 5) < 3, "click")
        .when((F.expr(f"(id div {n_users}) + id") % 5) == 3, "view")
        .otherwise("purchase")
        .alias("event_type"),
        ((F.col("id") % 97) / 3.0).alias("value"),
    )
    ev2.write.mode("overwrite").parquet(src2)
    schema2 = spark.read.parquet(src2).schema
    clicks = (
        spark.readStream.schema(schema2).parquet(src2)
        .filter(F.col("event_type") == "click")
    )
    purchases = (
        spark.readStream.schema(schema2).parquet(src2)
        .filter(F.col("event_type") == "purchase")
    )
    # parquet sink, not memory: the credited-pair stream is ~12M rows
    # at 10M events, and the memory sink would serialize all of them
    # through the driver (observed: a stalled drain) — a scale smoke
    # must use a distributed sink
    t0 = time.perf_counter()
    q2 = (
        stream_attribution(clicks, purchases)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/attr_out")
        .option("checkpointLocation", f"{tmp}/attr_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    dt = time.perf_counter() - t0
    n_pairs = spark.read.parquet(f"{tmp}/attr_out").count()
    print(
        f"stream attribution: {n:,} events in {dt:.1f}s "
        f"({n / dt:,.0f} events/s), {n_pairs:,} credited pairs; "
        f"state [{_state_summary(q2)}]",
        flush=True,
    )
    q2.stop()


if __name__ == "__main__":
    main()
