"""Optional plotly.js renderers for the report's headline charts.

The reference renders its report charts with plotly/datapane
(report_generation.py:3984-4416).  The repo's default renderer is
dependency-free stdlib SVG (report_html.py); this module provides the
same three headline charts — violin panel, correlation heatmap, drift
summary — as plotly FIGURE DICTS built from the identical frame data,
gated behind ``ANOVOS_SPARK_PLOTLY``:

- unset / ``0`` / ``false`` (default): stdlib SVG — a report never
  becomes network-dependent unless the user explicitly asks (r9: the
  old auto-on-import-success switch silently made reports trust the
  CDN whenever plotly happened to be installed);
- ``1``/``true``: plotly output (a figure is pure JSON, so no package
  is needed to EMIT it — plotly.js hydrates it in the browser);
- ``auto``: plotly only if ``import plotly`` succeeds.

Loader-script supply chain: ``ANOVOS_SPARK_PLOTLY_JS`` names a local
plotly.min.js to inline into the report (fully offline, no CDN trust);
otherwise the pinned CDN build loads with ``crossorigin=anonymous`` and,
when ``ANOVOS_SPARK_PLOTLY_SRI`` is set (e.g. ``sha384-…`` computed with
``openssl dgst -sha384 -binary plotly.min.js | openssl base64 -A``), an
``integrity`` attribute.  The SRI hash is not hard-coded because this
build environment has no network to verify one against the pinned CDN
artifact — a wrong pin would silently blank every chart.

Each figure embeds as ``<div class="plotly-fig"><script
type="application/json">…</script></div>``; one loader script per
report hydrates every such div via ``Plotly.newPlot``.  Values placed
into figures are data (JSON-encoded), never markup — the embed escapes
``</`` so a hostile string value can't close the JSON script block.
"""

from __future__ import annotations

import json
import os

#: pinned plotly.js build the loader script pulls from the CDN
PLOTLY_JS_CDN = "https://cdn.plot.ly/plotly-2.35.2.min.js"

_HOUSE_BLUE = "#3b6fd4"
_DRIFT_COLORS = {"PSI": "#3b6fd4", "JSD": "#2f9e6e", "HD": "#d4933b", "KS": "#b4564e"}


def plotly_enabled() -> bool:
    """The render gate (see module docstring): explicit opt-in only."""
    flag = os.environ.get("ANOVOS_SPARK_PLOTLY", "").strip().lower()
    if flag in ("1", "true", "yes"):
        return True
    if flag == "auto":
        try:
            import plotly  # noqa: F401

            return True
        except ImportError:
            return False
    return False


def embed_figure(fig: dict, css_class: str) -> str:
    """One figure → a self-contained embed div.  The JSON is escaped so
    an embedded data value can never terminate the script block (the
    report's injection barrier)."""
    payload = json.dumps(fig, separators=(",", ":")).replace("</", "<\\/")
    return (
        f'<div class="plotly-fig {css_class}">'
        f'<script type="application/json">{payload}</script></div>'
    )


def loader_script() -> str:
    """Per-report hydration script: finds every .plotly-fig, parses its
    JSON payload, and renders it with Plotly.newPlot.  Degrades to the
    (empty) divs when the CDN is unreachable.  See the module docstring
    for the ANOVOS_SPARK_PLOTLY_JS (inline vendoring) and
    ANOVOS_SPARK_PLOTLY_SRI (integrity pin) supply-chain controls."""
    local_js = os.environ.get("ANOVOS_SPARK_PLOTLY_JS", "").strip()
    if local_js:
        with open(local_js, encoding="utf-8") as fh:
            # only </script can close the block; '<\/script' is the same
            # string in JS, so this is a no-op for the script's behavior
            src = fh.read().replace("</script", "<\\/script")
        tag = f'<script charset="utf-8">{src}</script>'
    else:
        sri = os.environ.get("ANOVOS_SPARK_PLOTLY_SRI", "").strip()
        integrity = f' integrity="{sri}"' if sri else ""
        tag = (
            f'<script src="{PLOTLY_JS_CDN}" charset="utf-8"'
            f'{integrity} crossorigin="anonymous" '
            'referrerpolicy="no-referrer"></script>'
        )
    return (
        tag +
        "<script>window.addEventListener('DOMContentLoaded',function(){"
        "if(typeof Plotly==='undefined'){return;}"
        "document.querySelectorAll('.plotly-fig').forEach(function(el){"
        "var src=el.querySelector('script[type=\"application/json\"]');"
        "if(!src){return;}var fig=JSON.parse(src.textContent);"
        "var div=document.createElement('div');el.appendChild(div);"
        "Plotly.newPlot(div,fig.data,fig.layout,{displaylogo:false});});});"
        "</script>"
    )


def _base_layout(title: str) -> dict:
    return {
        "title": {"text": title, "font": {"size": 13}},
        "margin": {"l": 140, "r": 30, "t": 40, "b": 40},
        "paper_bgcolor": "#ffffff",
        "plot_bgcolor": "#ffffff",
        "font": {"family": "system-ui, sans-serif", "size": 11},
    }


def plotly_violins(
    box_items: list[tuple[str, float, float, float, float, float]],
    densities: dict[str, list[tuple[float, float, float]]],
    title: str,
) -> dict:
    """Violin + box panel from the same inputs as _svg_violins:
    box_items (label, lower_whisker, q1, median, q3, upper_whisker) and
    violin_frame densities.  Quartiles are PRE-COMPUTED engine-side, so
    the box traces carry only the seven numbers (never raw rows) —
    plotly.js box traces accept explicit q1/median/q3/fence arrays.
    Density silhouettes render as mirrored filled scatter traces, one
    per attribute, on a per-attribute normalized x axis."""
    box_items = [t for t in box_items if all(v is not None for v in t[1:])][:20]
    labels = [str(k) for k, *_ in box_items]
    data: list[dict] = [
        {
            "type": "box",
            "name": "box",
            "y": labels,
            "orientation": "h",
            "q1": [float(t[2]) for t in box_items],
            "median": [float(t[3]) for t in box_items],
            "q3": [float(t[4]) for t in box_items],
            "lowerfence": [float(t[1]) for t in box_items],
            "upperfence": [float(t[5]) for t in box_items],
            "marker": {"color": _HOUSE_BLUE},
            "showlegend": False,
        }
    ]
    # per-attribute mirrored density silhouette on its own span
    for k, lw, q1, med, q3, uw in box_items:
        dens = sorted(densities.get(str(k), []), key=lambda t: t[0])
        if not dens:
            continue
        xs = [(lo + hi) / 2.0 for lo, hi, _ in dens]
        ys = [max(0.0, min(1.0, d)) for _, _, d in dens]
        data.append(
            {
                "type": "scatter",
                "name": str(k),
                "x": xs + xs[::-1],
                "y": [0.38 * v for v in ys] + [-0.38 * v for v in ys[::-1]],
                "fill": "toself",
                "mode": "lines",
                "line": {"color": "#7ba3e8", "width": 1},
                "fillcolor": "rgba(207,224,255,0.9)",
                "xaxis": "x2",
                "yaxis": "y2",
                "showlegend": False,
                "hoverinfo": "name+x",
            }
        )
    layout = _base_layout(title)
    layout["height"] = max(220, 60 * len(labels) + 80)
    layout["yaxis"] = {"automargin": True}
    # silhouette overlay axes (free-floating, hidden ticks)
    layout["xaxis2"] = {"overlaying": "x", "visible": False}
    layout["yaxis2"] = {"overlaying": "y", "visible": False}
    return {"data": data, "layout": layout}


def plotly_bars(
    items: list[tuple[str, float]], title: str, unit: str = ""
) -> dict | None:
    """Horizontal bar chart from the same (label, value) items as
    _svg_bars."""
    items = [(k, v) for k, v in items if v is not None][:20]
    if not items:
        return None
    layout = _base_layout(title)
    layout["height"] = max(180, 24 * len(items) + 90)
    layout["yaxis"] = {"automargin": True, "autorange": "reversed"}
    if unit:
        layout["xaxis"] = {"ticksuffix": unit}
    return {
        "data": [
            {
                "type": "bar",
                "orientation": "h",
                "y": [str(k) for k, _ in items],
                "x": [float(v) for _, v in items],
                "marker": {"color": _HOUSE_BLUE},
                "hovertemplate": "%{y}: %{x}" + unit + "<extra></extra>",
            }
        ],
        "layout": layout,
    }


def plotly_paired_bars(
    items: list[tuple[str, float, float]],
    title: str,
    legend: tuple[str, str] = ("source", "target"),
) -> dict | None:
    """Grouped two-series horizontal bars (comparative drift) from the
    same items as _svg_paired_bars."""
    items = [
        (k, a, b) for k, a, b in items if a is not None and b is not None
    ][:20]
    if not items:
        return None
    labels = [str(k) for k, _, _ in items]
    layout = _base_layout(title)
    layout["barmode"] = "group"
    layout["height"] = max(200, 34 * len(items) + 110)
    layout["yaxis"] = {"automargin": True, "autorange": "reversed"}
    layout["legend"] = {"orientation": "h"}
    return {
        "data": [
            {
                "type": "bar",
                "name": legend[0],
                "orientation": "h",
                "y": labels,
                "x": [float(a) for _, a, _ in items],
                "marker": {"color": _HOUSE_BLUE},
            },
            {
                "type": "bar",
                "name": legend[1],
                "orientation": "h",
                "y": labels,
                "x": [float(b) for _, _, b in items],
                "marker": {"color": "#d4823b"},
            },
        ],
        "layout": layout,
    }


def plotly_gauge(
    value: float,
    vmax: float,
    bands: list[tuple[float, float, str]],
    title: str,
    fmt: str = "{:.2f}",
) -> dict | None:
    """Indicator gauge — plotly's native 'gauge+number' trace, the very
    shape the reference emits (go.Indicator panels,
    report_generation.py:142-160, :1521-1535).  ``fmt`` is the same
    python format string the SVG renderer takes; its spec maps onto the
    indicator's d3 ``number.valueformat`` ('{:.0f}' → '.0f') so both
    renderers show identically formatted values (r9 ADVICE)."""
    if not vmax or vmax <= 0:
        return None
    import re

    m = re.fullmatch(r"\{:([^}]*)\}", fmt or "")
    valueformat = m.group(1) if m else ".2f"
    return {
        "data": [
            {
                "type": "indicator",
                "mode": "gauge+number",
                "value": float(value),
                "number": {"valueformat": valueformat},
                "title": {"text": title, "font": {"size": 12}},
                "gauge": {
                    "axis": {"range": [0, float(vmax)]},
                    "bar": {"color": "#1a1a24", "thickness": 0.25},
                    "steps": [
                        {"range": [float(lo), float(hi)], "color": color}
                        for lo, hi, color in bands
                    ],
                },
            }
        ],
        "layout": {
            "height": 180,
            "width": 220,
            "margin": {"l": 20, "r": 20, "t": 30, "b": 10},
            "paper_bgcolor": "#ffffff",
            "font": {"family": "system-ui, sans-serif", "size": 11},
        },
    }


def plotly_trend(
    series: dict[str, list[float]], title: str
) -> dict | None:
    """Per-attribute metric trend lines across periods (the reference
    stability tab's go.Scatter) from the same series as _svg_trend."""
    series = {k: v for k, v in series.items() if v and len(v) >= 2}
    if not series:
        return None
    colors = {"mean": _HOUSE_BLUE, "stddev": "#dd9a57", "kurtosis": "#3e9460"}
    data = []
    for name, vs in series.items():
        pts = [(i, v) for i, v in enumerate(vs) if v is not None]
        if len(pts) < 2:
            continue
        data.append(
            {
                "type": "scatter",
                "mode": "lines+markers",
                "name": name,
                "x": [i for i, _ in pts],
                "y": [float(v) for _, v in pts],
                "line": {"color": colors.get(name, "#6b7280"), "width": 2},
            }
        )
    if not data:
        return None
    layout = _base_layout(title)
    layout["height"] = 220
    layout["width"] = 340
    layout["margin"] = {"l": 50, "r": 16, "t": 40, "b": 30}
    layout["xaxis"] = {"title": {"text": "period"}, "dtick": 1}
    layout["legend"] = {"orientation": "h"}
    return {"data": data, "layout": layout}


def plotly_corr_heatmap(pdf, title: str = "Correlation heatmap") -> dict | None:
    """Correlation heatmap from the same pivoted frame as
    _svg_corr_heatmap (the reference's px.imshow association panel,
    report_generation.py:336-341).  Returns None on a frame the SVG
    renderer would also skip."""
    if pdf is None:
        return None
    if {"attribute1", "attribute2", "corr"} <= set(pdf.columns):
        pdf = (
            pdf.pivot(index="attribute1", columns="attribute2", values="corr")
            .rename_axis(None, axis=1)
            .reset_index()
            .rename(columns={"attribute1": "attribute"})
        )
    if "attribute" not in pdf.columns:
        return None
    attrs = [str(a) for a in pdf["attribute"].tolist()]
    cols = [c for c in attrs if c in pdf.columns]
    if len(cols) < 2:
        return None
    rows = [(i, a) for i, a in enumerate(attrs) if a in cols]
    z = []
    for src_idx, _ in rows:
        r = pdf.iloc[src_idx]
        z.append([None if r.get(c) is None or r.get(c) != r.get(c) else float(r[c]) for c in cols])
    layout = _base_layout(title)
    layout["height"] = max(240, 28 * len(rows) + 120)
    layout["yaxis"] = {"autorange": "reversed", "automargin": True}
    return {
        "data": [
            {
                "type": "heatmap",
                "x": cols,
                "y": [a for _, a in rows],
                "z": z,
                "zmin": -1,
                "zmax": 1,
                "colorscale": [
                    [0.0, "#5c8adb"],
                    [0.5, "#ffffff"],
                    [1.0, "#ff823b"],
                ],
                "texttemplate": "%{z:.2f}",
            }
        ],
        "layout": layout,
    }


def plotly_drift_summary(
    rows_in: list[tuple[str, dict[str, float], bool]],
    threshold: float,
    title: str,
) -> dict | None:
    """Grouped PSI/JSD/HD/KS bars with the decision threshold as a
    dashed line shape — same inputs as _svg_drift_summary."""
    rows = [(str(a), m) for a, m, _ in rows_in if m]
    if not rows:
        return None
    attrs = [a for a, _ in rows]
    data = []
    for metric, color in _DRIFT_COLORS.items():
        vals = [m.get(metric) for _, m in rows]
        if all(v is None for v in vals):
            continue
        data.append(
            {
                "type": "bar",
                "name": metric,
                "orientation": "h",
                "y": attrs,
                "x": [0.0 if v is None else float(v) for v in vals],
                "marker": {"color": color},
            }
        )
    if not data:
        return None
    layout = _base_layout(title)
    layout["barmode"] = "group"
    layout["height"] = max(220, 26 * len(attrs) * len(data) / 2 + 120)
    layout["yaxis"] = {"automargin": True}
    layout["shapes"] = [
        {
            "type": "line",
            "x0": threshold,
            "x1": threshold,
            "y0": -0.5,
            "y1": len(attrs) - 0.5,
            "line": {"color": "#b4564e", "dash": "dash", "width": 1.5},
        }
    ]
    layout["legend"] = {"orientation": "h"}
    return {"data": data, "layout": layout}
