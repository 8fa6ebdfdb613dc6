"""As-of (point-in-time) join — the time-series join Spark lacks as a
built-in (SURVEY §2.3 extension point).

Implemented as the union-and-carry-forward composition: tag both
sides, union on the time axis, and carry the most recent right-side
row forward with ``last(..., ignorenulls=True)`` over a window
partitioned by the join keys.  This is a single sort per key group —
one shuffle on ``by`` — and never builds the O(n·m) range-join
intermediate a naive ``t_left >= t_right`` join would.

Skew note: highly active keys concentrate in single partitions; at
cluster scale enable AQE skew handling (on by default in our session)
or pre-salt the key if one entity dominates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right_time <= left_time`` within the same ``by`` group.

    ``value_cols`` are the right-side columns to carry.  Right rows at
    exactly ``left_time`` match (inclusive), matching DuckDB
    ``ASOF JOIN ... ON l.t >= r.t`` semantics.
    """
    by = list(by)
    l_tag = left.select(
        *by,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType.simpleString()
        ).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows at equal timestamps so an exact
    # match is visible to the left row (inclusive semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__is_left") == 1)
    out = carried.select(
        F.col("__lrow.*"),
        *[F.col(f"__carried_{c}").alias(c) for c in value_cols],
    )
    return out
