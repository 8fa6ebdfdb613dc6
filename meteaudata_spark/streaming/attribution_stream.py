"""Streaming click→purchase attribution: the watermarked
stream-stream join.

Every arriving purchase is joined to the same user's clicks from the
preceding attribution window — the classic "which touch gets credit"
query, and the one Structured Streaming shape the rest of the
streaming surface didn't yet exercise: a stream⋈stream inner join
with watermarks on BOTH sides and a time-range condition, so the
engine can bound each side's join state (clicks older than
``purchase watermark − window`` are evicted, matches emit as they
are found).

At scale the join shuffles both streams once on ``user_id``; state
per user is the clicks inside the attribution window — bounded by
the watermark, independent of stream length.  The differential test
pins the drained stream equal to the batch time-range join
(``ext/rangejoin``'s BETWEEN semantics) on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(purchase, click) pairs where the click precedes the purchase
    by at most ``attribution_window``, per user.

    Inputs are event streams with (event_id, ts, user_id, value)."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("lag_seconds"),
    )
