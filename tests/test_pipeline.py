"""End-to-end pipeline parity (reference tests/test_metEAUdata.py)."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.dataset import Dataset
from meteaudata_spark.metadata import DataProvenance
from meteaudata_spark.operators.multivariate import average_signals
from meteaudata_spark.operators.univariate import (
    linear_interpolation,
    predict_previous_point,
    replace_ranges,
    resample,
)
from meteaudata_spark.signal import Signal


@pytest.fixture()
def sample_dataset(spark, provenance):
    """Reference sample_dataset fixture (test_metEAUdata.py:14-95):
    100×3 normals @6min, 4 signals (D reuses column A)."""
    rng = np.random.default_rng(42)
    idx = pd.date_range("2020-01-01", freq="6min", periods=100)
    data = pd.DataFrame(
        rng.standard_normal((100, 3)), columns=["A", "B", "C"], index=idx
    )
    units = {"A": "mg/l", "B": "g/m3", "C": "uS/cm", "D": "mg/l"}
    cols = {"A": "A", "B": "B", "C": "C", "D": "A"}
    signals = {}
    for name in ["A", "B", "C", "D"]:
        ser = data[cols[name]].rename("RAW")
        sig = Signal(
            input_data=ser, name=name, units=units[name],
            provenance=provenance, spark=spark,
        )
        signals[sig.name] = sig
    return Dataset(
        name="test dataset",
        description="a small dataset to test the package",
        owner="test",
        purpose="testing",
        project="meteaudata-spark",
        signals=signals,
    ), data


def test_full_chain_matches_pandas(sample_dataset):
    ds, data = sample_dataset
    sig = ds.signals["A#1"]
    sig.process(["A#1_RAW#1"], resample, "5min")
    sig.process(
        ["A#1_RESAMPLED#1"],
        replace_ranges,
        [["2020-01-01 03:00:00", "2020-01-02 00:00:00"]],
        reason="sensor calibration procedure",
        replace_with=np.nan,
    )
    sig.process(["A#1_RESAMPLED#1"], linear_interpolation)
    sig.process(["A#1_LIN-INT#1"], predict_previous_point)

    ser = data["A"]
    ref_res = ser.resample("5min").mean()
    ref_rep = ref_res.copy()
    ref_rep.loc["2020-01-01 03:00:00":"2020-01-02 00:00:00"] = np.nan
    ref_int = ref_res.interpolate(method="linear")

    for name, ref in [
        ("A#1_RESAMPLED#1", ref_res),
        ("A#1_REPLACED-RANGES#1", ref_rep),
        ("A#1_LIN-INT#1", ref_int),
        ("A#1_PREV-PRED#1", ref_int),  # data unchanged, shift is metadata
    ]:
        got = sig.time_series[name].to_pandas()
        assert np.allclose(got.values, ref.values, equal_nan=True), name


def test_chain_depth(sample_dataset):
    # README.md:67-75 — RESAMPLED has 1 step, LIN-INT has 2
    ds, _ = sample_dataset
    sig = ds.signals["A#1"]
    sig.process(["A#1_RAW#1"], resample, "5min")
    sig.process(["A#1_RESAMPLED#1"], linear_interpolation)
    assert len(sig.time_series["A#1_RESAMPLED#1"].processing_steps) == 1
    assert len(sig.time_series["A#1_LIN-INT#1"].processing_steps) == 2


def test_lineage_closure(sample_dataset):
    # every step's input_series_names exist in the signal
    # (reference test_metEAUdata.py:238-249)
    ds, _ = sample_dataset
    for name in ["A#1", "B#1"]:
        sig = ds.signals[name]
        sig.process([f"{name}_RAW#1"], resample, "5min")
        sig.process([f"{name}_RESAMPLED#1"], linear_interpolation)
    for sig in ds.signals.values():
        for ts in sig.time_series.values():
            for step in ts.processing_steps:
                for in_name in step.input_series_names:
                    assert in_name in sig.all_time_series


def test_rerun_bumps_version(sample_dataset):
    ds, _ = sample_dataset
    sig = ds.signals["A#1"]
    sig.process(["A#1_RAW#1"], resample, "5min")
    sig.process(["A#1_RAW#1"], resample, "5min")
    assert "A#1_RESAMPLED#1" in sig.all_time_series
    assert "A#1_RESAMPLED#2" in sig.all_time_series


def test_average_mixed_units_raises(sample_dataset):
    ds, _ = sample_dataset
    for name in ["A#1", "B#1", "C#1"]:
        ds.signals[name].process([f"{name}_RAW#1"], resample, "5min")
    with pytest.raises(ValueError, match="different units"):
        ds.process(
            ["A#1_RESAMPLED#1", "B#1_RESAMPLED#1", "C#1_RESAMPLED#1"],
            average_signals,
        )


def test_average_values_and_step_arithmetic(sample_dataset):
    ds, data = sample_dataset
    for name in ["A#1", "B#1", "C#1"]:
        ds.signals[name].process([f"{name}_RAW#1"], resample, "5min")
        ds.signals[name].units = "mg/l"
    ds.process(
        ["A#1_RESAMPLED#1", "B#1_RESAMPLED#1", "C#1_RESAMPLED#1"],
        average_signals,
    )
    assert "AVERAGE#1" in ds.all_signals
    avg_ts = ds.signals["AVERAGE#1"].time_series["AVERAGE#1_RAW#1"]
    ref = pd.concat(
        [data[c].resample("5min").mean() for c in "ABC"], axis=1
    ).mean(axis=1)
    got = avg_ts.to_pandas()
    assert np.allclose(got.values, ref.values, equal_nan=True)
    # step arithmetic: Σ input steps + 1 (test_metEAUdata.py:345-353)
    expected = sum(
        len(ds.signals[f"{c}#1"].time_series[f"{c}#1_RESAMPLED#1"].processing_steps)
        for c in "ABC"
    ) + 1
    assert len(avg_ts.processing_steps) == expected


def test_rerun_dataset_process_renames_series(sample_dataset):
    # regression: the second AVERAGE run must produce AVERAGE#2 whose
    # SERIES are also prefixed AVERAGE#2_* (rename, not just the name)
    ds, _ = sample_dataset
    for name in ["A#1", "B#1"]:
        ds.signals[name].process([f"{name}_RAW#1"], resample, "5min")
        ds.signals[name].units = "mg/l"
    inputs = ["A#1_RESAMPLED#1", "B#1_RESAMPLED#1"]
    ds.process(inputs, average_signals)
    ds.process(inputs, average_signals)
    assert "AVERAGE#2" in ds.all_signals
    assert ds.signals["AVERAGE#2"].all_time_series == ["AVERAGE#2_RAW#1"]
    # lineage closure still holds for the renamed series
    ts = ds.signals["AVERAGE#2"].time_series["AVERAGE#2_RAW#1"]
    assert ts.processing_steps[-1].suffix == "RAW"


def test_dataset_add_versions_signal(sample_dataset, spark, provenance):
    ds, data = sample_dataset
    extra = Signal(
        input_data=data["B"].rename("RAW"), name="A", units="mg/l",
        provenance=provenance, spark=spark,
    )
    ds.add(extra)
    assert "A#2" in ds.all_signals
    assert "A#2_RAW#1" in ds.signals["A#2"].all_time_series


def test_persist_reuses_common_subplan(spark, provenance):
    """SURVEY §4: persisting a hot intermediate makes downstream
    transforms read cached partitions (InMemoryTableScan in the plan)
    instead of re-running the whole upstream chain."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.operators.univariate import (
        linear_interpolation,
        resample,
    )

    idx = pd.date_range("2020-01-01", freq="6min", periods=200)
    ser = pd.Series(np.random.default_rng(3).standard_normal(200), index=idx, name="RAW")
    sig = Signal(input_data=ser, name="P", units="x", provenance=provenance, spark=spark)
    sig.process(["P#1_RAW#1"], resample, "5min")
    sig.persist(["P#1_RESAMPLED#1"])
    try:
        sig.process(["P#1_RESAMPLED#1"], linear_interpolation)
        ts = sig.time_series["P#1_LIN-INT#1"]
        plan = ts.df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan[:1500]
        # values unchanged by caching
        ref = ser.resample("5min").mean().interpolate(method="linear")
        got = ts.to_pandas()
        assert np.allclose(got.values, ref.values, equal_nan=True)
    finally:
        sig.unpersist()


def test_checkpoint_truncates_plan(spark, provenance):
    """Checkpointing mid-chain replaces the upstream plan (including
    the resample aggregation) with a materialized leaf; values are
    unchanged.  Scalar maps alone collapse under Catalyst's project
    merging — the aggregate is what makes the chain's plan deep."""
    import numpy as np
    import pandas as pd

    from meteaudata_spark.operators.univariate import (
        resample,
        transform_values,
    )

    idx = pd.date_range("2020-01-01", freq="6min", periods=50)
    ser = pd.Series(np.arange(50.0), index=idx, name="RAW")

    def build(chkpt: bool):
        sig = Signal(
            input_data=ser, name="C", units="x", provenance=provenance, spark=spark
        )
        sig.process(["C#1_RAW#1"], resample, "5min")
        if chkpt:
            sig.time_series["C#1_RESAMPLED#1"].checkpoint()
        sig.process(["C#1_RESAMPLED#1"], transform_values, "value * 1.01", suffix="SCALED")
        return sig.time_series["C#1_SCALED#1"]

    deep = build(False)
    cut = build(True)
    plan_deep = cut_plan = None
    plan_deep = deep.df._jdf.queryExecution().optimizedPlan().toString()
    cut_plan = cut.df._jdf.queryExecution().optimizedPlan().toString()
    # without checkpoint the resample aggregation is still in the plan;
    # with it, the upstream collapses to a materialized leaf
    assert "Aggregate" in plan_deep or "Join" in plan_deep, plan_deep
    assert "Aggregate" not in cut_plan and "Join" not in cut_plan, cut_plan
    assert "LogicalRDD" in cut_plan or "Scan ExistingRDD" in cut_plan
    got_deep = deep.to_pandas()
    got_cut = cut.to_pandas()
    assert np.allclose(got_deep.values, got_cut.values, equal_nan=True)
