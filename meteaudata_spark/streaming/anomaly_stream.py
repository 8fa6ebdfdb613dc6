"""Streaming anomaly scoring: batch-trained control limits applied to
a live event stream.

The train/serve split every monitoring deployment uses: the Shewhart
center/±3σ fences come from the HISTORICAL store (the same stats
aggregation ``ts_control_chart`` runs), ride into the stream as a
broadcast-sized per-key table, and every arriving event is classified
by a STATELESS narrow projection — no streaming state at all, so the
operator adds zero memory pressure and scales with plain input
parallelism.  Retraining is a new fences table + query restart (or a
``foreachBatch`` re-join for hot swap).

Differential test: streamed flags equal the batch classification of
the same events under the same fences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_fences(history: DataFrame, sigmas: float = 3.0) -> DataFrame:
    """Per-event-type (center, lcl, ucl) from historical raw events —
    mean ± sigmas·σ of the value distribution, 6-decimal rounded so
    flag decisions replay exactly across engines and restarts."""
    mu0 = history.groupBy("event_type").agg(
        (F.round(F.avg("value") * 1000000.0) / 1000000.0).alias("mu0")
    )
    stats = (
        history.join(F.broadcast(mu0), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("mu0").alias("center"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value") - F.col("mu0"))
                * (F.col("value") - F.col("mu0"))
            ).alias("ss"),
        )
    )
    sigma = F.sqrt(F.col("ss") / F.col("n"))
    r6 = lambda c: F.round(c * 1000000.0) / 1000000.0  # noqa: E731
    return stats.select(
        "event_type",
        "center",
        r6(F.col("center") - sigmas * sigma).alias("lcl"),
        r6(F.col("center") + sigmas * sigma).alias("ucl"),
    )


def stream_anomaly_flags(stream: DataFrame, fences: DataFrame) -> DataFrame:
    """Classify each arriving event against the broadcast fences:
    status ∈ in_control / above_ucl / below_lcl / unknown_type."""
    status = (
        F.when(F.col("ucl").isNull(), "unknown_type")
        .when(F.col("value") > F.col("ucl"), "above_ucl")
        .when(F.col("value") < F.col("lcl"), "below_lcl")
        .otherwise("in_control")
    )
    return stream.join(F.broadcast(fences), "event_type", "left").select(
        "event_id",
        "ts",
        "event_type",
        "value",
        status.alias("status"),
    )
