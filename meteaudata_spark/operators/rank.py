"""Distributed global ranking — the scale-safe substitute for an
unpartitioned ``Window.orderBy`` (which funnels every row through ONE
task; fine at 10k rows, fatal at 10B).

The classic three-step range-rank:

  1. **Range-bucket** the rows on the primary sort value using
     ``percentile_approx`` boundaries (one tiny aggregate, broadcast
     back).  Rows with EQUAL primary values always land in the same
     bucket, so cross-bucket order is total regardless of tiebreak
     columns.  Boundary skew only unbalances bucket sizes — never
     correctness.
  2. **Local rank** inside each bucket with an ordinary partitioned
     window — parallel across buckets.
  3. **Prefix offsets** from the per-bucket row counts: the count
     table has ≤ ``n_buckets`` rows, so its running-sum window is
     trivially cheap; offsets broadcast-join back and
     ``global rank = offset + local rank``.

The result is exact (identical to ``row_number`` over the global
order) while every shuffle is either keyed by bucket or over the tiny
count table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__gr_bucket"
_LRANK = "__gr_lrank"
_OFF = "__gr_off"
_BOUNDS = "__gr_bounds"


def global_rank(
    df: DataFrame,
    value_col: str,
    *,
    ascending: bool = True,
    tiebreak_cols: Sequence[str] = (),
    n_buckets: int = 64,
    out_col: str = "rank",
) -> DataFrame:
    """Append ``out_col`` = exact 1-based global ``row_number`` of each
    row under ``ORDER BY value_col [DESC], *tiebreak_cols`` — without a
    single-partition window.

    ``tiebreak_cols`` must make the order total (e.g. a key column);
    ties in ``value_col`` alone would otherwise make ``row_number``
    nondeterministic — exactly as with a plain window.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        F.percentile_approx(value_col, probs, 10_000).alias(_BOUNDS)
    )
    joined = df.crossJoin(F.broadcast(bounds))

    v = F.col(value_col)
    # NULLs must land in the bucket where the window order would place
    # them: asc → NULLS FIRST (bucket 0), desc → NULLS LAST (final
    # bucket) — the in-bucket row_number then orders them consistently.
    if ascending:
        # bucket = how many boundaries sort strictly before this value
        bucket = F.when(v.isNull(), F.lit(0)).otherwise(
            F.size(F.filter(F.col(_BOUNDS), lambda b: b < v))
        )
        order: list[Column] = [v.asc()]
    else:
        bucket = F.when(v.isNull(), F.lit(n_buckets - 1)).otherwise(
            F.size(F.filter(F.col(_BOUNDS), lambda b: b > v))
        )
        order = [v.desc()]
    order += [F.col(c).asc() for c in tiebreak_cols]

    w_local = Window.partitionBy(_BUCKET).orderBy(*order)
    local = joined.withColumn(_BUCKET, bucket).withColumn(
        _LRANK, F.row_number().over(w_local)
    )

    counts = local.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy(_BUCKET).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        _BUCKET, F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias(_OFF)
    )

    return (
        local.join(F.broadcast(offsets), _BUCKET)
        .withColumn(out_col, (F.col(_OFF) + F.col(_LRANK)).cast("bigint"))
        .drop(_BUCKET, _LRANK, _OFF, _BOUNDS)
    )


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL ``NTILE(k)`` bucket from a 1-based global rank and total row
    count ``n``: the first ``n % k`` buckets get ``n div k + 1`` rows,
    the rest ``n div k`` — reproduced arithmetically so no global
    window is needed.  The divisions go through double, so results are
    exact for ``n`` < 2^53 (9·10¹⁵ rows — beyond any per-key aggregate
    this engine ranks)."""
    q = (n / k).cast("bigint")  # floor division (both non-negative)
    rem = n - q * k
    head = rem * (q + 1)  # rows living in the oversized buckets
    return (
        F.when(rank <= head, F.ceil(rank / (q + 1)))
        .otherwise(rem + F.ceil((rank - head) / q))
        .cast("bigint")
    )
