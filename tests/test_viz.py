"""Viz: downsampling + trace specs + dependency graph (plotly absent in
this environment → spec dicts)."""

import numpy as np
import pandas as pd

from meteaudata_spark import viz
from meteaudata_spark.operators.univariate import (
    linear_interpolation,
    predict_previous_point,
    resample,
)
from meteaudata_spark.signal import Signal


def _signal(spark, provenance, periods=5000):
    idx = pd.date_range("2020-01-01", freq="1min", periods=periods)
    ser = pd.Series(
        np.sin(np.arange(periods) / 100.0), index=idx, name="RAW"
    )
    return Signal(
        input_data=ser, name="V", units="x", provenance=provenance, spark=spark
    )


def test_downsample_caps_points(spark, provenance):
    sig = _signal(spark, provenance)
    ts = sig.time_series["V#1_RAW#1"]
    pdf = viz.downsample_for_plot(ts.df, max_points=200).toPandas()
    assert len(pdf) <= 201
    assert abs(pdf["value"].mean()) < 0.1  # means preserved roughly


def test_signal_plot_spec(spark, provenance):
    sig = _signal(spark, provenance, periods=500)
    sig.process(["V#1_RAW#1"], resample, "5min")
    result = viz.plot_signal(sig, max_points=100)
    if isinstance(result, dict):
        assert {t["name"] for t in result["data"]} == set(sig.all_time_series)
    else:  # plotly installed
        assert len(result.data) == len(sig.all_time_series)


def test_prediction_x_shift(spark, provenance):
    sig = _signal(spark, provenance, periods=100)
    sig.process(["V#1_RAW#1"], resample, "5min")
    sig.process(["V#1_RESAMPLED#1"], predict_previous_point)
    trace = viz.series_trace(sig.time_series["V#1_PREV-PRED#1"])
    assert trace["meta"]["x_shift_seconds"] == 300.0
    assert trace["mode"] == "lines+markers"


def test_dependency_graph(spark, provenance):
    sig = _signal(spark, provenance, periods=100)
    sig.process(["V#1_RAW#1"], resample, "5min")
    sig.process(["V#1_RESAMPLED#1"], linear_interpolation)
    result = viz.plot_dependency_graph(sig, "V#1_LIN-INT#1")
    spec = result if isinstance(result, dict) else None
    if spec:
        assert "V#1_LIN-INT#1" in spec["nodes"]
        assert any(
            e["origin"] == "V#1_RESAMPLED#1" and e["destination"] == "V#1_LIN-INT#1"
            for e in spec["edges"]
        )


def test_render_svg_real_output(spark, provenance):
    """The SVG renderer produces valid XML with one polyline per
    trace, the title, legend entries, and axis labels — real
    rendering with no plotting library."""
    import xml.etree.ElementTree as ET

    sig = _signal(spark, provenance, periods=500)
    sig.process(["V#1_RAW#1"], resample, "5min")
    spec = viz.plot_signal(sig, max_points=100)
    if not isinstance(spec, dict):  # plotly installed: spec path covered anyway
        spec = {
            "data": [
                {"name": t.name, "x": list(t.x), "y": list(t.y), "mode": t.mode}
                for t in spec.data
            ],
            "layout": {"title": "Signal V [x]"},
        }
    svg = viz.render_svg(spec)
    root = ET.fromstring(svg)  # well-formed XML
    ns = "{http://www.w3.org/2000/svg}"
    polylines = root.findall(f"{ns}polyline")
    assert len(polylines) == len(spec["data"])
    for pl in polylines:
        assert len(pl.attrib["points"].split()) > 10
    texts = [t.text for t in root.findall(f"{ns}text")]
    assert any("Signal V" in (t or "") for t in texts)
    for tr in spec["data"]:
        assert tr["name"] in texts


def test_render_svg_empty_and_prediction_markers(spark, provenance):
    import xml.etree.ElementTree as ET

    assert "empty plot" in viz.render_svg({"data": [], "layout": {}})
    # prediction traces (lines+markers) get circle markers
    spec = {
        "data": [
            {
                "name": "p",
                "x": [1.0, 2.0, 3.0],
                "y": [1.0, 4.0, 2.0],
                "mode": "lines+markers",
            }
        ],
        "layout": {"title": "t"},
    }
    root = ET.fromstring(viz.render_svg(spec))
    ns = "{http://www.w3.org/2000/svg}"
    assert len(root.findall(f"{ns}circle")) == 3
