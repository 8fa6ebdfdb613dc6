"""applyInPandasWithState: state must carry across micro-batches."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.streaming.stateful import stream_running_stats


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    rng = np.random.default_rng(13)
    src = str(tmp_path / "src")
    # two files -> (with maxFilesPerTrigger=1) two micro-batches
    pdf1 = pd.DataFrame(
        {"event_type": ["x"] * 50 + ["y"] * 30, "value": rng.normal(10, 2, 80)}
    )
    pdf2 = pd.DataFrame(
        {"event_type": ["x"] * 20, "value": rng.normal(10, 2, 20)}
    )
    spark.createDataFrame(pdf1).coalesce(1).write.parquet(src)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_running_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("running").toPandas()

    # final cumulative row per key must equal the full-dataset stats
    all_pdf = pd.concat([pdf1, pdf2])
    for key, grp in all_pdf.groupby("event_type"):
        rows = got[got["key"] == key]
        final = rows.loc[rows["n_total"].idxmax()]
        assert final["n_total"] == len(grp)
        assert abs(final["mean"] - grp["value"].mean()) < 1e-9
        assert abs(final["variance"] - grp["value"].var(ddof=1)) < 1e-9
    # state actually crossed batches: key x appears with two cumulative counts
    x_counts = sorted(got[got["key"] == "x"]["n_total"])
    assert x_counts == [50, 70]


def test_stream_hll_matches_batch(spark, tmp_path):
    """Drained-stream HLL estimate must EQUAL the batch operator's on
    the same rows (same integer registers, same final division)."""
    from pyspark.sql import functions as F

    from meteaudata_spark.ext.dedup import _h60
    from meteaudata_spark.ext.sketches import hll_distinct
    from meteaudata_spark.streaming.hll_stream import stream_hll_distinct

    src = str(tmp_path / "hll_src")
    base = spark.range(20000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("key"),
        F.pmod(_h60((F.col("id") % 5000).cast("string")), F.lit(1 << 60)).alias("h"),
    )
    # two files -> two micro-batches
    base.filter(F.col("id") % 4 < 2).coalesce(1).write.parquet(src)
    base.filter(F.col("id") % 4 >= 2).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_hll_distinct(stream)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hll_stream").toPandas()

    batch = {
        r["grp"]: r["hll_distinct"]
        for r in hll_distinct(spark.read.parquet(src).withColumnRenamed("key", "grp"), "grp").collect()
    }
    for key in ("a", "b"):
        rows = got[got["key"] == key]
        # last emitted row per key = cumulative estimate
        final_est = rows.iloc[-1]["hll_distinct"]
        assert final_est == batch[key], (key, final_est, batch[key])


def test_stream_ewma_state_matches_batch_kernel(spark, tmp_path):
    """The executable stateful EWMA must reproduce kernels.ewma
    trajectories exactly, with state carrying across micro-batches."""
    import os
    import shutil
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from meteaudata_spark.operators import kernels
    from meteaudata_spark.streaming.stateful import stream_ewma_state

    rng = np.random.default_rng(21)
    n = 240
    pdf = pd.DataFrame(
        {
            "event_type": ["a" if i % 2 else "b" for i in range(n)],
            "ts": np.arange(n, dtype=np.int64),
            "value": rng.standard_normal(n),
        }
    )
    # two micro-batches with increasing mtimes: state must carry over
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    for bi, part in enumerate((pdf.iloc[: n // 2], pdf.iloc[n // 2 :])):
        staging = str(tmp_path / f"stage{bi}")
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(staging)
        f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
        dst = f"{src}/{bi}.parquet"
        shutil.copy(f"{staging}/{f}", dst)
        os.utime(dst, (now - 300 + bi * 60,) * 2)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream_ewma_state(stream, alpha=0.25)
        .writeStream.format("memory")
        .queryName("ewma_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("ewma_state")
        .orderBy("key", "ts")
        .toPandas()
    )

    batch = (
        kernels.ewma(
            spark.createDataFrame(pdf).select(
                "event_type", F.col("ts").alias("timestamp"), "value"
            ),
            alpha=0.25,
            partition_cols=["event_type"],
        )
        .orderBy("event_type", "timestamp")
        .toPandas()
    )
    assert len(got) == n
    assert np.allclose(got["ewma"].to_numpy(), batch["value"].to_numpy())


def test_stream_holt_state_matches_batch_kernel(spark, tmp_path):
    """Online Holt must equal the batch kernel's (level, trend)
    trajectory with state carried across micro-batches."""
    import os
    import shutil
    import time

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from meteaudata_spark.operators import kernels
    from meteaudata_spark.streaming.stateful import stream_holt_state

    n = 160
    pdf = pd.DataFrame(
        {
            "event_type": ["r"] * n,
            "ts": np.arange(n, dtype=np.int64),
            "value": 2.0 + 0.3 * np.arange(n) + np.sin(np.arange(n) / 5),
        }
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = time.time()
    for bi, part in enumerate((pdf.iloc[: n // 2], pdf.iloc[n // 2 :])):
        staging = str(tmp_path / f"stage{bi}")
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(staging)
        f = next(x for x in os.listdir(staging) if x.endswith(".parquet"))
        shutil.copy(f"{staging}/{f}", f"{src}/{bi}.parquet")
        os.utime(f"{src}/{bi}.parquet", (now - 300 + bi * 60,) * 2)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        stream_holt_state(stream, alpha=0.5, beta=0.25)
        .writeStream.format("memory")
        .queryName("holt_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("holt_state").orderBy("ts").toPandas()

    batch = (
        kernels.holt(
            spark.createDataFrame(pdf).select(
                "event_type", F.col("ts").alias("timestamp"), "value"
            ),
            alpha=0.5,
            beta=0.25,
            partition_cols=["event_type"],
        )
        .orderBy("timestamp")
        .toPandas()
    )
    assert len(got) == n
    assert np.allclose(got["level"].to_numpy(), batch["__level"].to_numpy())
    assert np.allclose(got["trend"].to_numpy(), batch["__trend"].to_numpy())
    # the trend tracks the ramp slope within the sine term's ±0.2
    # derivative envelope
    assert abs(got["trend"].iloc[-1] - 0.3) < 0.25
