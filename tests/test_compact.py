"""Small-file compaction (sources/compact.py): fewer files, identical
data, accurate stats, and range-compaction keeps per-file min/max
clustering for pruning."""

from pyspark.sql import functions as F

from meteaudata_spark.sources.compact import (
    compact_parquet,
    small_file_report,
)


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    # 64 tiny files
    spark.range(100_000).select(
        "id", (F.col("id") % 97).alias("v")
    ).repartition(64).write.parquet(src)

    rep = small_file_report(spark, src, threshold_mb=1)
    assert rep["n_files"] == 64
    assert rep["n_small"] == 64 and rep["small_share"] == 1.0

    stats = compact_parquet(spark, src, out, target_file_mb=128)
    assert stats.files_before == 64
    assert stats.files_after < 8
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b
    assert stats.bytes_after > 0


def test_range_compaction_keeps_minmax_tight(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    src = str(tmp_path / "frag2")
    out = str(tmp_path / "byrange")
    # keyed data scattered round-robin across many files → every file
    # spans the whole key range before compaction
    spark.range(200_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    ).repartition(32).write.parquet(src)

    compact_parquet(spark, src, out, target_file_mb=1, range_cols=["k"])
    spans = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        mn = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((mx - mn) / 1000.0)
    assert len(spans) >= 2
    # range-partitioned files each cover a narrow slice of k
    assert sorted(spans)[len(spans) // 2] < 0.6, spans


def test_partitioned_write_prunes_and_caps_files(spark, tmp_path):
    import os

    from meteaudata_spark.sources.compact import write_partitioned_by_day

    out = str(tmp_path / "bydt")
    ev = spark.range(50_000).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestamp '2024-02-01' + make_interval(0,0,0,0,0,cast(id % 14400 as int),0)"
        ).alias("ts"),
        (F.col("id") % 10).cast("double").alias("value"),
    )
    write_partitioned_by_day(ev, out, max_files_per_partition=4)

    days = [d for d in os.listdir(out) if d.startswith("dt=")]
    assert len(days) == 10  # 14400 minutes = 10 days
    for d in days:
        files = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= 4, (d, len(files))

    # partition pruning: a one-day filter plans only that directory
    from meteaudata_spark.plans import inspect

    one_day = spark.read.parquet(out).filter(F.col("dt") == "2024-02-03")
    plan = inspect.formatted_plan(one_day)
    assert "PartitionFilters" in plan
    # minutes 2880..4319 (day 3) each carry 4 rows: 50000 ids over
    # 14400 minute slots gives 4 repeats below slot 5000
    assert one_day.count() == 5_760
    # row equality with the source
    assert spark.read.parquet(out).count() == 50_000
