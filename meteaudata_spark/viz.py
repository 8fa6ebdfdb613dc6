"""Visualization (SURVEY §2.10 L3): series / signal / dataset plots and
dependency-graph rendering.

Engine rule: plots NEVER collect raw data — every figure goes through
``downsample_for_plot`` (time-bucket mean capped at ``max_points``),
so a 100 TB series plots with the same driver memory as a 100-row one.

plotly is optional in this environment: when missing, the plot
functions return the figure *specification* dict (same data, same
layout) instead of a rendered figure — callers can feed it to plotly
elsewhere.  The prediction x-shift semantics of the reference
(types.py:435-448: x = index + freq × Σ step_distance of PREDICTION
steps) are honored.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meteaudata_spark.functions.epoch import epoch_seconds, seconds_to_ts
from meteaudata_spark.functions.freq import normalize_pandas_freq, to_seconds
from meteaudata_spark.signal import Signal
from meteaudata_spark.timeseries import INDEX_COL, VALUE_COL, TimeSeries

try:  # pragma: no cover - environment-dependent
    import plotly.graph_objects as go

    _HAS_PLOTLY = True
except ImportError:  # pragma: no cover
    go = None
    _HAS_PLOTLY = False


def downsample_for_plot(
    df: DataFrame, max_points: int = 2000
) -> DataFrame:
    """Bucket-mean downsampling sized from the series' own bounds —
    one aggregation, no driver-side data movement until the final
    (≤ max_points) collect."""
    bounds = df.agg(
        F.min(INDEX_COL).alias("mn"), F.max(INDEX_COL).alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    joined = df.crossJoin(F.broadcast(bounds))
    ts_dtype = dict(df.dtypes).get(INDEX_COL, "timestamp")
    span = epoch_seconds(F.col("mx")) - epoch_seconds(F.col("mn"))
    step = F.greatest(span / F.lit(max_points), F.lit(1e-9))
    bucket = F.floor(
        (epoch_seconds(F.col(INDEX_COL)) - epoch_seconds(F.col("mn"))) / step
    )
    return (
        joined.withColumn("__bucket", bucket)
        .groupBy("__bucket")
        .agg(
            seconds_to_ts(
                F.avg(epoch_seconds(F.col(INDEX_COL))), ts_dtype
            ).alias(INDEX_COL),
            F.avg(VALUE_COL).alias(VALUE_COL),
        )
        .drop("__bucket")
    )


def _prediction_shift_seconds(ts: TimeSeries) -> float:
    from meteaudata_spark.metadata import ProcessingType

    total_steps = sum(
        s.step_distance
        for s in ts.processing_steps
        if s.type == ProcessingType.PREDICTION
    )
    if not total_steps or not ts.index_metadata.frequency:
        return 0.0
    freq = normalize_pandas_freq(ts.index_metadata.frequency)
    try:
        return to_seconds(freq) * total_steps
    except Exception:
        return 0.0


def series_trace(ts: TimeSeries, max_points: int = 2000) -> dict[str, Any]:
    """Collect a downsampled trace spec for one TimeSeries, applying
    the reference's prediction x-shift."""
    pdf = downsample_for_plot(ts.df, max_points).orderBy(INDEX_COL).toPandas()
    shift = _prediction_shift_seconds(ts)
    x = pdf[INDEX_COL]
    if shift:
        import pandas as pd

        x = x + pd.Timedelta(seconds=shift)
    last_type = (
        ts.processing_steps[-1].type.value if ts.processing_steps else "raw"
    )
    return {
        "name": ts.name,
        "x": list(x),
        "y": list(pdf[VALUE_COL]),
        "mode": "lines+markers" if last_type == "prediction" else "lines",
        "meta": {"processing_type": last_type, "x_shift_seconds": shift},
    }


def plot_signal(
    signal: Signal,
    names: Optional[list[str]] = None,
    max_points: int = 2000,
    title: Optional[str] = None,
):
    """Overlay plot of a signal's series (reference types.py:900-926).
    Returns a plotly Figure when plotly is available, else the spec
    dict."""
    names = names or signal.all_time_series
    traces = [series_trace(signal.time_series[n], max_points) for n in names]
    layout = {
        "title": title or f"Signal {signal.name} [{signal.units}]",
        "xaxis": {"title": signal.time_series[names[0]].index_metadata.name or "time"},
        "yaxis": {"title": signal.units},
    }
    if not _HAS_PLOTLY:
        return {"data": traces, "layout": layout}
    fig = go.Figure()
    for t in traces:
        fig.add_trace(
            go.Scatter(x=t["x"], y=t["y"], name=t["name"], mode=t["mode"])
        )
    fig.update_layout(**layout)
    return fig


def plot_dataset(
    dataset,
    signal_names: Optional[list[str]] = None,
    max_points: int = 2000,
):
    """One subplot per signal (reference Dataset plot,
    types.py:1431-1473).  Returns a plotly Figure with stacked
    subplots, or the spec dict {signal: {data, layout}} without
    plotly."""
    signal_names = signal_names or dataset.all_signals
    specs = {}
    for name in signal_names:
        sig = dataset.signals[name]
        traces = [
            series_trace(sig.time_series[n], max_points)
            for n in sig.all_time_series
        ]
        specs[name] = {
            "data": traces,
            "layout": {"title": f"{name} [{sig.units}]"},
        }
    if not _HAS_PLOTLY:
        return specs
    from plotly.subplots import make_subplots

    fig = make_subplots(
        rows=len(signal_names), cols=1,
        subplot_titles=[f"{n} [{dataset.signals[n].units}]" for n in signal_names],
    )
    for row, name in enumerate(signal_names, start=1):
        for t in specs[name]["data"]:
            fig.add_trace(
                go.Scatter(x=t["x"], y=t["y"], name=t["name"], mode=t["mode"]),
                row=row, col=1,
            )
    return fig


def plot_dependency_graph(signal: Signal, series_name: str):
    """Render the lineage DAG of a series (reference types.py:951-1054).
    Text/dict form when plotly is missing."""
    edges = signal.build_dependency_graph(series_name)
    nodes = sorted(
        {e["origin"] for e in edges} | {e["destination"] for e in edges}
    )
    spec = {"nodes": nodes, "edges": edges}
    if not _HAS_PLOTLY:
        return spec
    # simple layered layout: depth = #steps back from the target
    depth: dict[str, int] = {series_name: 0}
    changed = True
    while changed:
        changed = False
        for e in edges:
            d = depth.get(e["destination"])
            if d is not None and depth.get(e["origin"], None) != d + 1:
                depth[e["origin"]] = d + 1
                changed = True
    xs = {n: -depth.get(n, 0) for n in nodes}
    ys = {n: i for i, n in enumerate(nodes)}
    fig = go.Figure()
    for e in edges:
        fig.add_trace(
            go.Scatter(
                x=[xs[e["origin"]], xs[e["destination"]]],
                y=[ys[e["origin"]], ys[e["destination"]]],
                mode="lines",
                line={"color": "#888"},
                showlegend=False,
            )
        )
    fig.add_trace(
        go.Scatter(
            x=[xs[n] for n in nodes],
            y=[ys[n] for n in nodes],
            text=nodes,
            mode="markers+text",
            textposition="top center",
        )
    )
    return fig


# ---------------------------------------------------------------------
# real rendering without plotly: standalone SVG from a plot spec
# ---------------------------------------------------------------------
_SVG_COLORS = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728",
               "#9467bd", "#8c564b", "#e377c2", "#7f7f7f"]


def _svg_escape(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def render_svg(
    spec: dict[str, Any], width: int = 800, height: int = 400
) -> str:
    """Render a ``plot_signal`` spec dict (``{"data": traces,
    "layout": ...}``) to a standalone SVG string — REAL rendering with
    zero plotting dependencies (pure string assembly), so the plot
    path is executable in this container even though plotly isn't
    installed.  Lines per trace, markers for prediction traces, axis
    frame with min/max tick labels, title, and a legend."""
    traces = spec.get("data", [])
    pad_l, pad_r, pad_t, pad_b = 60, 120, 40, 40
    pw, ph = width - pad_l - pad_r, height - pad_t - pad_b

    def _num(x) -> float:
        # datetimes plot on their epoch-seconds axis
        try:
            return float(x)
        except (TypeError, ValueError):
            import pandas as pd

            return pd.Timestamp(x).timestamp()

    xs_all = [_num(x) for t in traces for x in t.get("x", [])]
    ys_all = [
        float(y)
        for t in traces
        for y in t.get("y", [])
        if y is not None and y == y
    ]
    if not xs_all or not ys_all:
        return (
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}"><text x="10" y="20">empty plot</text></svg>'
        )
    x0, x1 = min(xs_all), max(xs_all)
    y0, y1 = min(ys_all), max(ys_all)
    xr = (x1 - x0) or 1.0
    yr = (y1 - y0) or 1.0

    def sx(x: float) -> float:
        return pad_l + (x - x0) / xr * pw

    def sy(y: float) -> float:
        return pad_t + (1.0 - (y - y0) / yr) * ph

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">',
        f'<rect x="{pad_l}" y="{pad_t}" width="{pw}" height="{ph}" '
        'fill="none" stroke="#333" stroke-width="1"/>',
    ]
    title = spec.get("layout", {}).get("title", "")
    if title:
        parts.append(
            f'<text x="{width / 2}" y="24" text-anchor="middle" '
            f'font-size="16">{_svg_escape(title)}</text>'
        )
    # min/max tick labels on both axes
    parts += [
        f'<text x="{pad_l}" y="{height - 12}" font-size="10">'
        f"{_svg_escape(traces[0]['x'][0])}</text>",
        f'<text x="{width - pad_r}" y="{height - 12}" text-anchor="end" '
        f'font-size="10">{_svg_escape(traces[0]["x"][-1])}</text>',
        f'<text x="{pad_l - 6}" y="{sy(y0) + 4}" text-anchor="end" '
        f'font-size="10">{y0:.4g}</text>',
        f'<text x="{pad_l - 6}" y="{sy(y1) + 4}" text-anchor="end" '
        f'font-size="10">{y1:.4g}</text>',
    ]
    for i, t in enumerate(traces):
        color = _SVG_COLORS[i % len(_SVG_COLORS)]
        pts = [
            (sx(_num(x)), sy(float(y)))
            for x, y in zip(t.get("x", []), t.get("y", []))
            if y is not None and y == y
        ]
        if not pts:
            continue
        path = " ".join(f"{px:.2f},{py:.2f}" for px, py in pts)
        parts.append(
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{path}"/>'
        )
        if "markers" in t.get("mode", ""):
            parts += [
                f'<circle cx="{px:.2f}" cy="{py:.2f}" r="2.5" '
                f'fill="{color}"/>'
                for px, py in pts
            ]
        ly = pad_t + 14 + i * 16
        parts += [
            f'<line x1="{width - pad_r + 8}" y1="{ly - 4}" '
            f'x2="{width - pad_r + 28}" y2="{ly - 4}" stroke="{color}" '
            'stroke-width="2"/>',
            f'<text x="{width - pad_r + 32}" y="{ly}" font-size="11">'
            f"{_svg_escape(t.get('name', f'trace{i}'))}</text>",
        ]
    parts.append("</svg>")
    return "".join(parts)
