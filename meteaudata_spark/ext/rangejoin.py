"""Batch range join ([EXT]): point-in-interval joins without the
nested-loop trap.

Spark has no native range-join optimization (Databricks' range-join
hints are proprietary): a plain ``ts BETWEEN start AND end`` join
plans as BroadcastNestedLoopJoin — per-row interval scans that
collapse at scale.  The standard open-source remedy, implemented
here: explode every interval into the fixed-width TIME BUCKETS it
spans, map each point to its bucket, equi-join on (keys…, bucket),
then apply the exact BETWEEN as a post-filter.  Every shuffle is a
keyed hash exchange; each (point, interval) pair meets exactly once
(in the point's bucket), so no dedup is needed.

Bucket sizing: cost is O(intervals × span/bucket) fan-out on one side
and one bucket key per point on the other — pick ``bucket_seconds``
near the MEDIAN interval length (fan-out ~2); a handful of very long
intervals fan out proportionally and AQE's skew split handles the hot
buckets.  The plan guard test pins the equi-join strategy (no
BroadcastNestedLoopJoin / CartesianProduct).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meteaudata_spark.functions.epoch import epoch_seconds


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    partition_cols: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= ts <= end``, inclusive), optionally co-keyed on
    ``partition_cols``.  Returns points columns + interval columns.

    ``how``: 'inner' (default) or 'left' (points without a containing
    interval keep nulls — implemented as inner + anti union so the
    bucketed path stays equi-join-only)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    pcols = list(partition_cols)
    b = F.lit(bucket_seconds)
    # surrogate row id BEFORE any exchange: both the matched branch and
    # the left-variant anti branch share this scan-stage projection, so
    # ids line up (and NULL-valued point columns can't confuse the anti
    # join the way whole-row equality would)
    points = points.withColumn("__rj_id", F.monotonically_increasing_id())
    if how == "left":
        # the matched and anti branches are two executions of this
        # lineage; if an upstream shuffle recomputes with a different
        # row order, monotonically_increasing_id would disagree between
        # them — pin the ids by truncating lineage at the id assignment
        points = points.localCheckpoint(eager=False)
    p = points.withColumn(
        "__bucket", F.floor(epoch_seconds(F.col(ts_col)) / b).cast("bigint")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(F.col(start_col)) / b).cast("bigint"),
                F.floor(epoch_seconds(F.col(end_col)) / b).cast("bigint"),
            )
        ),
    )
    joined = (
        p.join(iv, pcols + ["__bucket"], "inner")
        .filter(
            (epoch_seconds(F.col(ts_col)) >= epoch_seconds(F.col(start_col)))
            & (epoch_seconds(F.col(ts_col)) <= epoch_seconds(F.col(end_col)))
        )
        .drop("__bucket")
    )
    if how == "inner":
        return joined.drop("__rj_id")
    ikeys = [c for c in intervals.columns if c not in pcols]
    matched = joined
    unmatched = points.join(
        matched.select("__rj_id").distinct(), "__rj_id", "left_anti"
    )
    for c in ikeys:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched).drop("__rj_id")


def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: events joined to deterministic "maintenance
    windows" (one 45-minute window every 6 hours over the events'
    time span) — per-window event count and mean value.  The windows
    are generated relationally from the corpus time bounds (1-row
    aggregate broadcast), so the whole query is self-contained."""
    from meteaudata_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.floor(F.min(epoch_seconds(F.col("ts"))) / 21600).alias("b0"),
        F.floor(F.max(epoch_seconds(F.col("ts"))) / 21600).alias("b1"),
    )
    windows = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("w")
    ).select(
        (F.col("w") * 21600).cast("bigint").alias("win_start"),
        (F.col("w") * 21600 + 2700).cast("bigint").alias("win_end"),
    )
    joined = range_join(
        ev.select("event_type", "ts", "value"),
        windows,
        ts_col="ts",
        start_col="win_start",
        end_col="win_end",
        bucket_seconds=3600,
    )
    return joined.groupBy("win_start", "win_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value") * 1000000.0).cast("bigint").alias("avg_micros"),
    )


TS_RANGE_JOIN_SQL = """
WITH bounds AS (
  SELECT CAST(floor(MIN(epoch(ts)) / 21600) AS BIGINT) AS b0,
         CAST(floor(MAX(epoch(ts)) / 21600) AS BIGINT) AS b1
  FROM events
),
windows AS (
  SELECT CAST(w * 21600 AS BIGINT) AS win_start,
         CAST(w * 21600 + 2700 AS BIGINT) AS win_end
  FROM (SELECT UNNEST(range(b0, b1 + 1)) AS w FROM bounds)
)
SELECT w.win_start, w.win_end,
       COUNT(*) AS n_events,
       CAST(round(AVG(e.value) * 1000000.0) AS BIGINT) AS avg_micros
FROM events e JOIN windows w
  ON epoch(e.ts) >= w.win_start AND epoch(e.ts) <= w.win_end
GROUP BY w.win_start, w.win_end
ORDER BY w.win_start
"""
