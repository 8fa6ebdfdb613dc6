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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """``pandas.merge_asof``-parity as-of join: ``direction`` is
    backward (latest right ≤ t), forward (earliest right ≥ t) or
    nearest (closer of the two; ties → backward, pandas semantics).
    ``tolerance_seconds`` nulls out matches farther than the limit.

    Same single-sort union-and-carry plan as ``asof_join_backward``
    for each direction — nearest costs two window passes over ONE
    union (both directions share the sort by reversing frame order,
    not re-shuffling).  Differentially tested against
    ``pandas.merge_asof`` across directions and tolerances.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest; got {direction}")
    by = list(by)
    vcols = list(value_cols)
    carry = vcols + ["__rt"]

    l_tag = left.select(
        *by,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in vcols],
        F.lit(None).cast(dict(right.dtypes)[right_time]).alias("__r___rt"),
    )
    r_tag = right.select(
        *by,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType.simpleString()).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in vcols],
        F.col(right_time).alias("__r___rt"),
    )
    unioned = l_tag.unionByName(r_tag)

    # backward: ascending time, right-before-left at equal t;
    # forward: the same partition sorted once — the frame just runs
    # from the other end (currentRow → following over ascending order
    # is O(n²); instead order descending so 'forward' is again a
    # running last())
    w_b = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    sel: list = ["*"]
    if direction in ("backward", "nearest"):
        sel += [
            F.last(f"__r_{c}", ignorenulls=True).over(w_b).alias(f"__b_{c}")
            for c in carry
        ]
    if direction in ("forward", "nearest"):
        sel += [
            F.last(f"__r_{c}", ignorenulls=True).over(w_f).alias(f"__f_{c}")
            for c in carry
        ]
    carried = unioned.select(*sel).filter(F.col("__is_left") == 1)

    def _secs(name: str):
        # NTZ timestamps can't cast straight to double; hop through
        # TIMESTAMP (session pinned to UTC, so the hop is identity)
        return F.col(name).cast("timestamp").cast("double")

    def _within(side: str):
        if tolerance_seconds is None:
            return F.lit(True)
        gap = F.abs(_secs("__t") - _secs(f"__{side}___rt"))
        return gap <= F.lit(float(tolerance_seconds))

    if direction == "backward":
        pick = {c: F.when(_within("b"), F.col(f"__b_{c}")) for c in vcols}
    elif direction == "forward":
        pick = {c: F.when(_within("f"), F.col(f"__f_{c}")) for c in vcols}
    else:
        back_gap = _secs("__t") - _secs("__b___rt")
        fwd_gap = _secs("__f___rt") - _secs("__t")
        # nearest: pick the closer side; ties and missing-forward →
        # backward (pandas tie rule), missing-backward → forward
        use_b = F.col("__b___rt").isNotNull() & (
            F.col("__f___rt").isNull() | (back_gap <= fwd_gap)
        )
        pick = {
            c: F.when(use_b & _within("b"), F.col(f"__b_{c}")).otherwise(
                F.when(~use_b & _within("f"), F.col(f"__f_{c}"))
            )
            for c in vcols
        }
    return carried.select(
        F.col("__lrow.*"), *[pick[c].alias(c) for c in vcols]
    )
