"""Small-file compaction ([EXT] storage maintenance): the nightly
job every parquet lake needs — thousands of tiny files from
micro-batch ingestion re-written into target-size files so scans
stop paying per-file open/footer costs and the driver stops choking
on listing.

Sizing comes from the actual on-disk bytes (Hadoop FileSystem API, so
it works against HDFS/S3A the same as local), not a row-count guess:
``n_out = ceil(total_bytes / target)``.  The rewrite is either a
round-robin ``repartition(n)`` (pure size leveling) or a
``repartitionByRange`` on caller-named columns — the latter keeps the
file-level min/max clustering that makes footer pruning work (the
same reason ``zorder.py`` exists; compaction must not destroy it).

The output lands in a new directory and the swap is left to the
caller/orchestrator (rename is atomic on HDFS, copy-swap on object
stores) — a library should not delete data it did not create.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionStats:
    files_before: int
    bytes_before: int
    files_after: int
    bytes_after: int


def _list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) of every data file under ``path`` via the Hadoop
    FileSystem API (locator-agnostic: file://, hdfs://, s3a://)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        out.append((st.getPath().toString(), st.getLen()))
    return out


def small_file_report(
    spark: SparkSession, path: str, threshold_mb: int = 32
) -> dict:
    """Diagnostic before compacting: how bad is the small-file
    problem?  Driver-side listing only — no data is read."""
    files = _list_files(spark, path)
    threshold = threshold_mb * 1024 * 1024
    small = [sz for _, sz in files if sz < threshold]
    total = sum(sz for _, sz in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_small": len(small),
        "small_share": (len(small) / len(files)) if files else 0.0,
        "avg_file_bytes": (total // len(files)) if files else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_mb: int = 128,
    range_cols: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet dataset at ``path`` into ``out_path`` with
    ~``target_file_mb``-sized files.  ``range_cols`` switches the
    shuffle to a range partitioning on those columns so per-file
    min/max stats stay tight (pruning-preserving compaction)."""
    before = _list_files(spark, path)
    total = sum(sz for _, sz in before)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if range_cols:
        df = df.repartitionByRange(n_out, *range_cols)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_path)
    after = _list_files(spark, out_path)
    return CompactionStats(
        files_before=len(before),
        bytes_before=total,
        files_after=len(after),
        bytes_after=sum(sz for _, sz in after),
    )


def write_partitioned_by_day(
    df,
    path: str,
    ts_col: str = "ts",
    max_files_per_partition: int = 4,
) -> None:
    """Write an event table laid out for TIME-pruned scans:
    ``partitionBy(dt)`` directories (Hive-style) with the in-partition
    file count capped — the ingestion layout that makes "last 7 days"
    queries read only 7 directories (partition pruning happens at
    planning time, before any I/O).

    The repartition keys on (dt, hash bucket) so each day writes at
    most ``max_files_per_partition`` files regardless of upstream
    parallelism — the alternative (32 tasks × 30 days = 960 tiny
    files per month) is exactly what ``compact_parquet`` exists to
    clean up after."""
    from pyspark.sql import functions as F

    with_dt = df.withColumn("dt", F.to_date(F.col(ts_col)))
    bucket = F.pmod(
        F.xxhash64(F.col(ts_col)), F.lit(max_files_per_partition)
    )
    (
        with_dt.repartition(F.col("dt"), bucket)
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )
