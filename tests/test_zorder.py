"""Z-order clustering (sources/zorder.py): files cover small
hyper-rectangles in BOTH clustered dimensions, so parquet min/max
footer statistics can prune on either column — the property a
single-column sort cannot provide."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from meteaudata_spark.sources.zorder import _zvalue, zorder_by


def _file_spans(spark, path, col):
    """Per parquet file: (max-min) span of ``col``, from the data
    itself (what the footer stats will contain)."""
    df = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    rows = (
        df.groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .collect()
    )
    return [r["span"] for r in rows]


def test_zorder_interleave_bits():
    d = pd.DataFrame({"a": [0b101, 0b000, 0b111], "b": [0b011, 0b000, 0b111]})
    from meteaudata_spark.session import get_spark

    spark = get_spark("meteaudata-tests")
    out = (
        spark.createDataFrame(d)
        .withColumn("z", _zvalue(["a", "b"]))
        .orderBy("a")
        .collect()
    )
    got = {(r["a"], r["b"]): r["z"] for r in out}
    # interleave(a=101, b=011): z bits low→high are
    # a0=1, b0=1, a1=0, b1=1, a2=1, b2=0  →  0b011011
    assert got[(0b000, 0b000)] == 0
    assert got[(0b101, 0b011)] == 0b011011
    assert got[(0b111, 0b111)] == 0b111111


def test_zorder_files_are_tight_in_both_dims(spark, tmp_path):
    n = 200_000
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "x": rng.integers(0, 1_000_000, n),
            "y": rng.integers(0, 1_000_000, n),
            "payload": rng.integers(0, 100, n),
        }
    )
    df = spark.createDataFrame(pdf)

    sorted_path = str(tmp_path / "sorted_x")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        sorted_path
    )
    z_path = str(tmp_path / "zorder")
    zorder_by(df, ["x", "y"], n_files=16).write.parquet(z_path)

    # single-column sort: x spans tiny, y spans ~full range
    sx = _file_spans(spark, sorted_path, "x")
    sy = _file_spans(spark, sorted_path, "y")
    assert np.median(sx) < 150_000
    assert np.median(sy) > 900_000
    # z-order: BOTH dims substantially tighter than full range —
    # min/max pruning works for filters on either column
    zx = _file_spans(spark, z_path, "x")
    zy = _file_spans(spark, z_path, "y")
    assert np.median(zx) < 600_000
    assert np.median(zy) < 600_000
    assert np.median(zx) + np.median(zy) < np.median(sx) + np.median(sy)
    # layout change only: content identical
    assert spark.read.parquet(z_path).count() == n
    assert (
        spark.read.parquet(z_path).agg(F.sum("x"), F.sum("y")).collect()
        == df.agg(F.sum("x"), F.sum("y")).collect()
    )


def test_zorder_rejects_bad_cols(spark):
    d = spark.createDataFrame(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError):
        zorder_by(d, [])
    with pytest.raises(ValueError):
        zorder_by(d, ["a"] * 5)
