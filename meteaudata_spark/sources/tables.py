"""Benchmark-table loader with schema normalization.

``events.parquet`` stores ``ts`` as Parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright.  We read it with the
legacy nanos-as-long mode and truncate to microseconds — the same
thing DuckDB's µs-precision TIMESTAMP does, so oracle comparisons
agree.  Predicate pushdown still applies (the column is a plain INT64
at the Parquet level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            # nanos → micros, truncating like DuckDB does
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
