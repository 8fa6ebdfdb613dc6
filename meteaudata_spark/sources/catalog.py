"""SQL catalog: expose benchmark tables and Signals/Datasets as temp
views so the whole engine is queryable through ``spark.sql``.

Spark-first principle: anything expressible over the registered views
gets the full Catalyst treatment for free — this is the engine's ad
hoc query surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from meteaudata_spark.sources.tables import load_table

BENCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_benchmark_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every benchmark parquet as a temp view (events with the
    nanos-timestamp normalization applied)."""
    for name in BENCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(BENCH_TABLES)


def register_signal(signal, prefix: str = "") -> list[str]:
    """One view per series (``{prefix}{series_name}``, sanitized) plus a
    long view ``{prefix}{signal_name}_long``."""
    names = []
    for full, ts in signal.time_series.items():
        view = _sanitize(prefix + full)
        ts.df.createOrReplaceTempView(view)
        names.append(view)
    long_view = _sanitize(prefix + signal.name + "_long")
    signal.to_long_dataframe().createOrReplaceTempView(long_view)
    names.append(long_view)
    return names


def register_dataset(dataset, prefix: str = "") -> list[str]:
    """All signals' views plus one dataset-wide long view."""
    names = []
    for sig in dataset.signals.values():
        names.extend(register_signal(sig, prefix))
    view = _sanitize(prefix + dataset.name + "_long")
    dataset.to_long_dataframe().createOrReplaceTempView(view)
    names.append(view)
    return names


def _sanitize(name: str) -> str:
    out = "".join(c if c.isalnum() or c == "_" else "_" for c in name)
    return out if not out[0].isdigit() else f"v_{out}"
