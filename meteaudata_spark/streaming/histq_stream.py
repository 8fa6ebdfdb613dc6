"""Streaming histogram quantiles: per-window p50/p90/p99 for a live
metrics feed.

The batch sketch (``ext/sketches.hist_quantiles``) derives its bin
range from a bounds pass — a luxury a stream doesn't have, so the
streaming twin takes CALLER-SUPPLIED bounds (the standard contract
for streaming histograms: sensor ranges are known up front, and
out-of-range values clamp into the edge bins).  Everything else is
one watermarked tumbling-window aggregation: the per-bin counts are
``n_bins`` conditional-sum columns (a single stateful operator — no
chained aggs, no custom state), and the quantile estimates are a
stateless projection over the resulting histogram array.

State per open window is O(n_bins) longs per key.  Estimates use the
same ceil(q·n) rank-target in-bin interpolation as the batch sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _est_expr(q: float, lo: float, width: float) -> str:
    """Quantile-estimate SQL over the 1-based ``__cum``/``__h`` arrays:
    locate the first bin whose cumulative count reaches ceil(q·n),
    interpolate within it.  Arrays are ≤ n_bins elements, so the
    repeated filter scans are negligible."""
    t = f"CAST(ceil({q!r} * element_at(__cum, -1)) AS BIGINT)"
    b = (
        "element_at(filter(sequence(1, size(__cum)), "
        f"i -> element_at(__cum, i) >= {t} "
        f"AND (i = 1 OR element_at(__cum, i - 1) < {t})), 1)"
    )
    before = f"IF({b} = 1, 0L, element_at(__cum, {b} - 1))"
    c = f"CAST(element_at(__h, {b}) AS DOUBLE)"
    return (
        f"round(({lo!r} + {width!r} * (CAST({b} - 1 AS DOUBLE) "
        f"+ CAST({t} - {before} AS DOUBLE) / {c})) * 1000000.0) / 1000000.0"
    )


def stream_hist_quantiles(
    stream: DataFrame,
    lo: float,
    hi: float,
    n_bins: int = 64,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    quantiles: tuple = (0.5, 0.9, 0.99),
    partition_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, tumbling window): histogram-sketch quantile estimates
    over ``[lo, hi)``; values outside the range clamp into the edge
    bins, null values are dropped."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (hi - lo) / float(n_bins)
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    base = (
        stream.withWatermark(ts_col, watermark)
        .filter(F.col(value_col).isNotNull())
        .select(partition_col, F.col(ts_col), bin_col.alias("__bin"))
    )
    counts = [
        F.sum((F.col("__bin") == i).cast("bigint")).alias(f"__c{i}")
        for i in range(n_bins)
    ]
    agg = base.groupBy(
        partition_col, F.window(ts_col, window).alias("win")
    ).agg(*counts)
    hist = (
        agg.select(
            partition_col,
            F.col("win.start").alias("window_start"),
            F.array(*[F.col(f"__c{i}") for i in range(n_bins)]).alias("__h"),
        )
        .withColumn(
            "__cum",
            F.expr(
                "transform(sequence(1, size(__h)), "
                "i -> aggregate(slice(__h, 1, i), 0L, (a, x) -> a + x))"
            ),
        )
    )
    out = [
        F.col(partition_col),
        F.col("window_start"),
        F.expr("element_at(__cum, -1)").alias("n_rows"),
    ]
    for q in quantiles:
        out.append(
            F.expr(_est_expr(float(q), float(lo), float(width))).alias(
                f"p{int(round(q * 100))}"
            )
        )
    return hist.select(*out)
