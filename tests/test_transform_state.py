"""transformWithStateInPandas EWMA: plan construction always; full
execution only where the worker runtime (protobuf) exists."""

import numpy as np
import pandas as pd
import pytest

from meteaudata_spark.streaming.transform_state import (
    EWMA_OUTPUT_SCHEMA,
    has_transform_with_state_runtime,
    stream_ewma,
)


def _source(spark, tmp_path):
    idx = pd.date_range("2024-01-01", freq="1min", periods=60)
    pdf = pd.DataFrame(
        {
            "key": ["a" if i % 2 else "b" for i in range(60)],
            "timestamp": idx,
            "value": np.arange(60.0),
        }
    )
    path = str(tmp_path / "ewma_src")
    spark.createDataFrame(pdf).write.parquet(path)
    return path, pdf


def test_stream_ewma_plan_builds(spark, tmp_path):
    path, _ = _source(spark, tmp_path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_ewma(stream, alpha=0.3)
    assert out.isStreaming
    assert out.schema == EWMA_OUTPUT_SCHEMA


@pytest.mark.xfail(
    condition=not has_transform_with_state_runtime(),
    reason=(
        "transformWithStateInPandas needs google.protobuf for the "
        "Python-worker state-server protocol; this container has no "
        "protobuf and no network to fetch it (verified round 7: pip "
        "download fails with no route to the index). The EXECUTABLE "
        "twin of this operator is stateful.stream_ewma_state "
        "(applyInPandasWithState), differential-tested in "
        "test_stateful_streaming.py; this test runs wherever the "
        "runtime exists."
    ),
    run=False,
)
def test_stream_ewma_matches_pandas(spark, tmp_path):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    path, pdf = _source(spark, tmp_path)
    schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        stream_ewma(stream, alpha=0.3)
        .writeStream.format("memory")
        .queryName("ewma")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.table("ewma")
        .toPandas()
        .sort_values(["key", "timestamp"])
        .reset_index(drop=True)
    )
    ref_parts = []
    for k, g in pdf.groupby("key"):
        s = pd.Series(g["value"].values, index=g["timestamp"])
        ref_parts.append(
            pd.DataFrame(
                {
                    "key": k,
                    "timestamp": s.index,
                    "ref": s.ewm(alpha=0.3, adjust=False).mean().values,
                }
            )
        )
    ref = (
        pd.concat(ref_parts)
        .sort_values(["key", "timestamp"])
        .reset_index(drop=True)
    )
    assert np.allclose(got["ewma"].values, ref["ref"].values)


def test_runtime_probe_pins_exact_missing_dependency():
    """Capability probe (VERDICT r9 #5): pins EXACTLY which import
    gates transformWithState execution, and that our gate flag agrees
    with what pyspark's own generated protocol module does — so the
    moment the environment gains a protobuf runtime, this probe still
    passes and the xfail'd execution test above flips to run
    automatically (its condition re-evaluates per session).

    Environment facts re-verified round 10: no google.protobuf in
    site-packages, no vendored protobuf wheel anywhere on disk (the
    only filesystem hits are typeshed stubs), and pip download fails
    with no route to any index — a pure-Python shim of the protobuf
    runtime (descriptor pool + builder + wire format + version
    validation) was judged a correctness hazard for a state-server
    protocol, not a stub-able boundary.
    """
    flag = has_transform_with_state_runtime()
    try:
        import google.protobuf.descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False
    assert flag == have_protobuf

    # pyspark's generated state protocol must be importable exactly
    # when the protobuf runtime exists — if this starts diverging
    # (e.g. a pyspark upgrade changes the protocol's dependencies),
    # the gate flag must be retaught
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        pb2_ok = True
        err = None
    except ImportError as exc:
        pb2_ok = False
        err = exc
    assert pb2_ok == have_protobuf
    if not pb2_ok:
        assert "google" in str(err) or "protobuf" in str(err), err
