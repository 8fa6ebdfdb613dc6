"""Benchmark-table loader with schema normalization.

``events.parquet`` stores ``ts`` as Parquet TIMESTAMP(NANOS), which
Spark's vectorized reader rejects outright.  We read it with the
legacy nanos-as-long mode and truncate to microseconds — the same
thing DuckDB's µs-precision TIMESTAMP does, so oracle comparisons
agree.  Predicate pushdown still applies (the column is a plain INT64
at the Parquet level).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# r15 (guide §5 — the driver should do almost no data work): every
# ``spark.read.parquet`` call costs ~0.1-0.3 s of DRIVER time (file
# listing, footer/schema read, plan analysis over py4j), and the 231
# gate rows call the table loaders several times EACH — profiling
# showed ~87 s of a full bench pass was Python-side DataFrame
# construction.  The loader DataFrame is immutable and LAZY, so one
# per (session, sf_dir, table) serves every query: this memoizes the
# unexecuted plan object only — nothing is persisted, and every
# action over it still computes from the parquet files.
_TABLE_MEMO: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_TABLE_MEMO_CAP = 64


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_MEMO.get(key)
    if df is not None:
        return df
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes)["ts"] == "bigint":
            # nanos → micros, truncating like DuckDB does
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_MEMO[key] = df
    while len(_TABLE_MEMO) > _TABLE_MEMO_CAP:
        _TABLE_MEMO.popitem(last=False)
    return df
