"""Self-contained HTML report assembly (no datapane/plotly dependency).

Reference parity: data_report/report_generation.anovos_report
(report_generation.py:3984-4416) writes ``ml_anovos_report.html`` — a
tabbed document with executive-summary / descriptive-statistics /
quality-check / attribute-associations / drift sections built from the
analyzer battery.  The reference renders via datapane + plotly (neither
is in this environment, and both are presentation-layer); this module
produces the same artifact — one self-contained HTML file with the same
section structure — from the engine's own stats frames, using only the
standard library: inline CSS, HTML tables, and hand-built SVG bar charts.

Interactivity (r5, datapane-report parity without the dependency): the
sections render as TABS, table headers sort on click (numeric-aware),
tables longer than 3 rows get a live filter box, and every SVG mark
carries a hover tooltip.  All of it is one engine-authored inline script
+ CSS; data values pass through html.escape everywhere, so the document
stays injection-safe, and with scripts disabled it degrades to the
static stacked layout.

Everything data-shaped stays in Spark: the frames rendered here are the
driver-sized stats outputs (one row per attribute), never the data.
"""

from __future__ import annotations

import html as _html
import os
from datetime import datetime, timezone

from pandas import isna as pd_isna

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif; margin: 0;
       color: #1a1a24; background: #f6f7f9; }
header { background: #1f2a44; color: #fff; padding: 18px 32px; }
header h1 { margin: 0; font-size: 20px; font-weight: 600; }
header p { margin: 4px 0 0; font-size: 12px; opacity: .75; }
nav { background: #fff; border-bottom: 1px solid #e2e5ea; padding: 0 32px;
      position: sticky; top: 0; }
nav a { display: inline-block; padding: 10px 14px; font-size: 13px;
        color: #1f2a44; text-decoration: none; }
nav a:hover { background: #eef1f6; }
main { padding: 24px 32px; max-width: 1100px; }
section { background: #fff; border: 1px solid #e2e5ea; border-radius: 6px;
          margin-bottom: 24px; padding: 18px 22px; }
section h2 { margin: 0 0 4px; font-size: 16px; }
section h3 { margin: 18px 0 6px; font-size: 13px; color: #4a5568;
             text-transform: uppercase; letter-spacing: .04em; }
table { border-collapse: collapse; font-size: 12.5px; margin-top: 6px; }
th, td { border: 1px solid #e2e5ea; padding: 4px 10px; text-align: left; }
th { background: #f0f2f6; font-weight: 600; }
td.num { text-align: right; font-variant-numeric: tabular-nums; }
.kpi { display: inline-block; margin: 6px 18px 6px 0; }
.kpi b { display: block; font-size: 20px; }
.kpi span { font-size: 11px; color: #4a5568; text-transform: uppercase; }
.gauge-row { display: flex; flex-wrap: wrap; gap: 4px; margin-top: 8px; }
.note { font-size: 11.5px; color: #6b7280; margin: 2px 0 0; }
nav a.active { border-bottom: 2px solid #3b6fd4; font-weight: 600; }
body.tabbed main section { display: none; }
body.tabbed main section.active { display: block; }
th { cursor: pointer; user-select: none; }
th.sorted-asc::after { content: " \\2191"; color: #3b6fd4; }
th.sorted-desc::after { content: " \\2193"; color: #3b6fd4; }
input.tfilter { margin: 8px 0 0; padding: 4px 8px; font-size: 12px;
                border: 1px solid #cfd5de; border-radius: 4px; width: 240px; }
"""

# One engine-authored script block; every data value in the document is
# written through _html.escape, so the page stays injection-safe (the
# test probes this with a hostile value).  Interactivity mirrors the
# reference's datapane report: tabbed sections, click-to-sort table
# headers (numeric-aware), and a filter box on larger tables.  No-JS
# fallback: all sections render stacked, tables stay static.
_JS = """
(function () {
  document.body.classList.add('tabbed');
  var links = document.querySelectorAll('nav a');
  function activate(id) {
    document.querySelectorAll('main section').forEach(function (s) {
      s.classList.toggle('active', s.id === id);
    });
    links.forEach(function (a) {
      a.classList.toggle('active', a.getAttribute('href') === '#' + id);
    });
  }
  links.forEach(function (a) {
    a.addEventListener('click', function (e) {
      e.preventDefault();
      activate(a.getAttribute('href').slice(1));
      try { history.replaceState(null, '', a.getAttribute('href')); }
      catch (err) { /* file:// in some browsers */ }
    });
  });
  var first = document.querySelector('main section');
  var want = location.hash.slice(1);
  activate(document.getElementById(want) ? want : (first ? first.id : ''));

  document.querySelectorAll('table').forEach(function (t) {
    var ths = t.querySelectorAll('thead th');
    ths.forEach(function (th, idx) {
      th.addEventListener('click', function () {
        var tb = t.querySelector('tbody');
        var rows = Array.prototype.slice.call(tb.querySelectorAll('tr'));
        var asc = !th.classList.contains('sorted-asc');
        ths.forEach(function (h) {
          h.classList.remove('sorted-asc', 'sorted-desc');
        });
        th.classList.add(asc ? 'sorted-asc' : 'sorted-desc');
        rows.sort(function (a, b) {
          var x = a.cells[idx].textContent, y = b.cells[idx].textContent;
          var nx = parseFloat(x.replace(/,/g, '')),
              ny = parseFloat(y.replace(/,/g, ''));
          var c = (!isNaN(nx) && !isNaN(ny))
            ? nx - ny : x.localeCompare(y);
          return asc ? c : -c;
        });
        rows.forEach(function (r) { tb.appendChild(r); });
      });
    });
  });

  document.querySelectorAll('input.tfilter').forEach(function (inp) {
    var t = document.getElementById(inp.dataset.table);
    inp.addEventListener('input', function () {
      var q = inp.value.toLowerCase();
      t.querySelectorAll('tbody tr').forEach(function (r) {
        r.style.display =
          r.textContent.toLowerCase().indexOf(q) >= 0 ? '' : 'none';
      });
    });
  });
})();
"""

_table_seq = [0]


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:,.6g}"
    return str(v)


def _table(pdf, max_rows: int = 200) -> str:
    """Render a driver-sized pandas frame as an escaped HTML table.

    Headers sort on click and tables longer than 3 rows get a filter box
    (both wired by the engine's single script block); every cell value
    passes through html.escape, so data can never inject markup."""
    _table_seq[0] += 1
    tid = f"tbl{_table_seq[0]}"
    cols = list(pdf.columns)
    head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in cols)
    body = []
    for _, r in pdf.head(max_rows).iterrows():
        cells = []
        for c in cols:
            v = r[c]
            klass = ' class="num"' if isinstance(v, (int, float)) else ""
            cells.append(f"<td{klass}>{_html.escape(_fmt(v))}</td>")
        body.append("<tr>" + "".join(cells) + "</tr>")
    more = (
        f'<p class="note">… {len(pdf) - max_rows} more rows omitted</p>'
        if len(pdf) > max_rows
        else ""
    )
    flt = (
        f'<br><input class="tfilter" data-table="{tid}" '
        f'placeholder="filter rows…">'
        if len(pdf) > 3
        else ""
    )
    return (
        f'{flt}<table id="{tid}"><thead><tr>{head}</tr></thead>'
        f"<tbody>{''.join(body)}</tbody></table>{more}"
    )


def _svg_bars(items: list[tuple[str, float]], title: str, unit: str = "") -> str:
    """Horizontal bar chart as inline SVG — no charting library."""
    items = [(k, v) for k, v in items if v is not None][:20]
    if not items:
        return ""
    vmax = max((abs(v) for _, v in items), default=0.0) or 1.0
    bar_h, gap, label_w, plot_w = 16, 6, 180, 420
    height = len(items) * (bar_h + gap) + 28
    rows = []
    for i, (k, v) in enumerate(items):
        y = 24 + i * (bar_h + gap)
        w = max(1.0, abs(v) / vmax * plot_w)
        rows.append(
            f'<text x="{label_w - 8}" y="{y + 12}" text-anchor="end" '
            f'font-size="11" fill="#1a1a24">{_html.escape(str(k)[:28])}</text>'
            f'<rect x="{label_w}" y="{y}" width="{w:.1f}" height="{bar_h}" '
            f'fill="#3b6fd4" rx="2">'
            f"<title>{_html.escape(str(k))}: {_fmt(v)}{unit}</title></rect>"
            f'<text x="{label_w + w + 6:.1f}" y="{y + 12}" font-size="10.5" '
            f'fill="#4a5568">{_fmt(v)}{unit}</text>'
        )
    return (
        f'<svg width="{label_w + plot_w + 90}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">'
        f'<text x="0" y="14" font-size="12" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title)}</text>{"".join(rows)}</svg>'
    )


def _svg_paired_bars(
    items: list[tuple[str, float, float]],
    title: str,
    legend: tuple[str, str] = ("source", "target"),
) -> str:
    """Grouped two-series horizontal bars (comparative drift view —
    reference plot_comparative_drift's shape) as inline SVG."""
    items = [
        (k, a, b) for k, a, b in items if a is not None and b is not None
    ][:20]
    if not items:
        return ""
    vmax = max((max(abs(a), abs(b)) for _, a, b in items), default=0.0) or 1.0
    bar_h, gap, label_w, plot_w = 9, 10, 180, 420
    height = len(items) * (2 * bar_h + gap) + 46
    rows = []
    for i, (k, a, b) in enumerate(items):
        y = 40 + i * (2 * bar_h + gap)
        wa = max(1.0, abs(a) / vmax * plot_w)
        wb = max(1.0, abs(b) / vmax * plot_w)
        rows.append(
            f'<text x="{label_w - 8}" y="{y + bar_h + 3}" text-anchor="end" '
            f'font-size="11" fill="#1a1a24">{_html.escape(str(k)[:28])}</text>'
            f'<rect x="{label_w}" y="{y}" width="{wa:.1f}" height="{bar_h}" '
            f'fill="#3b6fd4" rx="2">'
            f"<title>{_html.escape(str(k))} — {_html.escape(legend[0])}: "
            f"{_fmt(a)}</title></rect>"
            f'<rect x="{label_w}" y="{y + bar_h + 1}" width="{wb:.1f}" '
            f'height="{bar_h}" fill="#d4823b" rx="2">'
            f"<title>{_html.escape(str(k))} — {_html.escape(legend[1])}: "
            f"{_fmt(b)}</title></rect>"
        )
    leg = (
        f'<rect x="0" y="22" width="10" height="10" fill="#3b6fd4"></rect>'
        f'<text x="14" y="31" font-size="10.5" fill="#4a5568">'
        f"{_html.escape(legend[0])}</text>"
        f'<rect x="90" y="22" width="10" height="10" fill="#d4823b"></rect>'
        f'<text x="104" y="31" font-size="10.5" fill="#4a5568">'
        f"{_html.escape(legend[1])}</text>"
    )
    return (
        f'<svg width="{label_w + plot_w + 90}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">'
        f'<text x="0" y="14" font-size="12" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title)}</text>{leg}{"".join(rows)}</svg>'
    )


def _svg_violins(
    box_items: list[tuple[str, float, float, float, float, float]],
    densities: dict[str, list[tuple[float, float, float]]],
    title: str,
) -> str:
    """True violin silhouettes as inline SVG (plotly-style: mirrored
    density polygon with the box overlaid), zero dependencies.

    box_items: (label, lower_whisker, q1, median, q3, upper_whisker);
    densities: label → [(bin_lo, bin_hi, density 0..1)], the
    violin_frame output.  Each attribute scales to its own data span, so
    mixed-unit attributes share one panel.  Falls back to the box-only
    row when an attribute has no density bins."""
    box_items = [t for t in box_items if all(v is not None for v in t[1:])][:20]
    if not box_items:
        return ""
    row_h, gap, label_w, plot_w = 34, 12, 180, 420
    height = len(box_items) * (row_h + gap) + 28
    rows = []
    for i, (k, lw, q1, med, q3, uw) in enumerate(box_items):
        y = 24 + i * (row_h + gap)
        mid = y + row_h / 2
        dens = densities.get(str(k), [])
        span_lo = min([lw] + [d[0] for d in dens])
        span_hi = max([uw] + [d[1] for d in dens])
        span = (span_hi - span_lo) or 1.0

        def x(v):
            return label_w + max(0.0, min(1.0, (v - span_lo) / span)) * plot_w

        half_h = row_h / 2 - 2
        violin = ""
        if dens:
            # mirrored density polygon: top edge left→right, bottom
            # edge right→left (both from the same bin heights)
            pts_top, pts_bot = [], []
            for lo, hi, d in sorted(dens, key=lambda t: t[0]):
                cx = (x(lo) + x(hi)) / 2
                dy = half_h * max(0.0, min(1.0, d))
                pts_top.append(f"{cx:.1f},{mid - dy:.1f}")
                pts_bot.append(f"{cx:.1f},{mid + dy:.1f}")
            poly = " ".join(pts_top + pts_bot[::-1])
            violin = (
                f'<polygon class="violin" points="{poly}" fill="#cfe0ff" '
                f'stroke="#7ba3e8" stroke-width="1" opacity="0.9"></polygon>'
            )
        rows.append(
            f'<text x="{label_w - 8}" y="{mid + 4}" text-anchor="end" '
            f'font-size="11" fill="#1a1a24">{_html.escape(str(k)[:28])}</text>'
            f"{violin}"
            f'<line x1="{x(lw):.1f}" y1="{mid}" x2="{x(uw):.1f}" y2="{mid}" '
            f'stroke="#9aa4b2"></line>'
            f'<rect x="{x(q1):.1f}" y="{mid - 5}" '
            f'width="{max(1.0, x(q3) - x(q1)):.1f}" height="10" '
            f'fill="#ffffff" stroke="#3b6fd4" rx="2" opacity="0.85">'
            f"<title>{_html.escape(str(k))}: whiskers [{_fmt(lw)}, {_fmt(uw)}], "
            f"IQR [{_fmt(q1)}, {_fmt(q3)}], median {_fmt(med)}</title></rect>"
            f'<line x1="{x(med):.1f}" y1="{mid - 7}" x2="{x(med):.1f}" '
            f'y2="{mid + 7}" stroke="#1a3c82" stroke-width="2"></line>'
            f'<text x="{label_w + plot_w + 6}" y="{mid + 4}" font-size="10.5" '
            f'fill="#4a5568">med {_fmt(med)}</text>'
        )
    return (
        f'<svg width="{label_w + plot_w + 110}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">'
        f'<text x="0" y="14" font-size="12" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title)}</text>{"".join(rows)}</svg>'
    )


_DRIFT_COLORS = {"PSI": "#3b6fd4", "JSD": "#2f9e6e", "HD": "#d4933b", "KS": "#b4564e"}


def _svg_drift_summary(
    rows_in: list[tuple[str, dict[str, float], bool]],
    threshold: float,
    title: str,
) -> str:
    """Drift-metric summary: grouped horizontal bars (PSI/JSD/HD/KS per
    attribute) with the decision threshold as a dashed marker line and
    flagged attributes tinted — the reference's drift overview chart,
    stdlib SVG.  rows_in: (attribute, {metric: value}, flagged)."""
    rows_in = rows_in[:20]
    if not rows_in:
        return ""
    metrics = ["PSI", "JSD", "HD", "KS"]
    bar_h, gap, label_w, plot_w = 9, 3, 180, 420
    grp_h = len(metrics) * (bar_h + 2) + 6
    height = len(rows_in) * (grp_h + gap) + 44
    vmax = max(
        [threshold * 2]
        + [v for _, m, _ in rows_in for v in m.values() if v is not None]
    )
    parts = []
    tx = label_w + min(1.0, threshold / vmax) * plot_w
    parts.append(
        f'<line class="drift-threshold" x1="{tx:.1f}" y1="24" x2="{tx:.1f}" '
        f'y2="{height - 16}" stroke="#888" stroke-dasharray="4 3"></line>'
        f'<text x="{tx + 4:.1f}" y="{height - 4}" font-size="10" '
        f'fill="#666">threshold {threshold}</text>'
    )
    for i, (attr, mvals, flagged) in enumerate(rows_in):
        gy = 28 + i * (grp_h + gap)
        name_fill = "#b4564e" if flagged else "#1a1a24"
        parts.append(
            f'<text x="{label_w - 8}" y="{gy + grp_h / 2 + 2}" text-anchor="end" '
            f'font-size="11" font-weight="{700 if flagged else 400}" '
            f'fill="{name_fill}">{_html.escape(str(attr)[:28])}'
            f"{' ⚑' if flagged else ''}</text>"
        )
        for j, m in enumerate(metrics):
            v = mvals.get(m)
            if v is None:
                continue
            by = gy + j * (bar_h + 2)
            w = max(1.0, min(1.0, v / vmax) * plot_w)
            parts.append(
                f'<rect x="{label_w}" y="{by}" width="{w:.1f}" height="{bar_h}" '
                f'fill="{_DRIFT_COLORS[m]}" rx="1.5" '
                f'opacity="{1.0 if flagged else 0.75}">'
                f"<title>{_html.escape(str(attr))} {m} = {_fmt(v)}</title></rect>"
            )
    legend = "".join(
        f'<rect x="{label_w + k * 90}" y="14" width="10" height="10" '
        f'fill="{_DRIFT_COLORS[m]}" rx="2"></rect>'
        f'<text x="{label_w + k * 90 + 14}" y="23" font-size="10.5" '
        f'fill="#4a5568">{m}</text>'
        for k, m in enumerate(metrics)
    )
    return (
        f'<svg class="drift-summary" width="{label_w + plot_w + 110}" '
        f'height="{height}" xmlns="http://www.w3.org/2000/svg" role="img">'
        f'<text x="0" y="14" font-size="12" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title)}</text>{legend}{"".join(parts)}</svg>'
    )


def _svg_corr_heatmap(pdf, title: str = "Correlation heatmap") -> str:
    """Correlation-matrix heatmap (the reference's px.imshow panel in the
    association tab, report_generation.py:336-341) as stdlib SVG: one
    cell per (attribute, attribute) with a blue/white/orange diverging
    fill over [-1, 1] and the value as a tooltip + in-cell label."""
    if pdf is None:
        return ""
    if {"attribute1", "attribute2", "corr"} <= set(pdf.columns):
        # long form (the correlation_matrix operator's output) → wide
        pdf = (
            pdf.pivot(index="attribute1", columns="attribute2", values="corr")
            .rename_axis(None, axis=1)
            .reset_index()
            .rename(columns={"attribute1": "attribute"})
        )
    if "attribute" not in pdf.columns:
        return ""
    attrs = [str(a) for a in pdf["attribute"].tolist()]
    cols = [c for c in attrs if c in pdf.columns]
    if len(cols) < 2:
        return ""
    # rows actually rendered: attrs present as pivot columns — a
    # non-square pivot (attribute missing as a column) must shrink the
    # viewport too, or the extra rows draw outside it
    row_entries = [(idx, a) for idx, a in enumerate(attrs) if a in cols]
    cell_w, cell_h, label_w, top_h = 52, 22, 150, 84
    width = label_w + cell_w * len(cols) + 10
    height = top_h + cell_h * len(row_entries) + 8

    def fill(v: float) -> str:
        # diverging: -1 -> house blue, 0 -> white, +1 -> house orange
        t = max(-1.0, min(1.0, v))
        if t >= 0:
            r, g, b = 255, 255 - t * (255 - 130), 255 - t * (255 - 59)
        else:
            t = -t
            r, g, b = 255 - t * (255 - 92), 255 - t * (255 - 138), 255 - t * (255 - 219)
        return f"rgb({r:.0f},{g:.0f},{b:.0f})"

    parts = [
        f'<text x="0" y="14" font-size="12" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title)}</text>'
    ]
    for j, c in enumerate(cols):
        x = label_w + j * cell_w + cell_w / 2
        parts.append(
            f'<text x="{x}" y="{top_h - 8}" font-size="10" fill="#4a5568" '
            f'text-anchor="start" transform="rotate(-45 {x} {top_h - 8})">'
            f"{_html.escape(c[:16])}</text>"
        )
    for i, (src_idx, a) in enumerate(row_entries):
        y = top_h + i * cell_h
        parts.append(
            f'<text x="{label_w - 8}" y="{y + cell_h / 2 + 3}" text-anchor="end" '
            f'font-size="10.5" fill="#1a1a24">{_html.escape(a[:22])}</text>'
        )
        row = pdf.iloc[src_idx]
        for j, c in enumerate(cols):
            v = row.get(c)
            if v is None or pd_isna(v):
                continue
            v = float(v)
            x = label_w + j * cell_w
            txt_fill = "#1a1a24" if abs(v) < 0.65 else "#ffffff"
            parts.append(
                f'<rect class="corr-cell" x="{x}" y="{y}" width="{cell_w - 1}" '
                f'height="{cell_h - 1}" fill="{fill(v)}" rx="2">'
                f"<title>corr({_html.escape(a)}, {_html.escape(c)}) = {v:.3f}</title></rect>"
                f'<text x="{x + (cell_w - 1) / 2}" y="{y + cell_h / 2 + 3}" '
                f'text-anchor="middle" font-size="9.5" fill="{txt_fill}">{v:.2f}</text>'
            )
    return (
        f'<svg class="corr-heatmap" width="{width}" height="{height}" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">{"".join(parts)}</svg>'
    )


#: 0-4 stability-index bands, the reference's gauge steps
#: (report_generation.py:146-156: Reds for <2, orange to 3, greens above)
_SI_BANDS = [
    (0.0, 1.0, "#a63d38"),
    (1.0, 2.0, "#c4655c"),
    (2.0, 3.0, "#dd9a57"),
    (3.0, 3.5, "#7fbf8f"),
    (3.5, 4.0, "#3e9460"),
]


def _svg_gauge(
    value: float,
    vmax: float,
    bands: list[tuple[float, float, str]],
    title: str,
    fmt: str = "{:.2f}",
) -> str:
    """Semicircular indicator gauge (the reference's go.Indicator
    'gauge+number' panels — per-attribute stability index,
    report_generation.py:142-160, and the drifted-feature counter,
    :1521-1535) as stdlib SVG: colored band arcs, a needle at ``value``,
    and the number below the pivot."""
    import math

    if not vmax or vmax <= 0:
        return ""
    v = min(max(float(value), 0.0), float(vmax))
    cx, cy, r = 80.0, 74.0, 58.0

    def pt(frac: float, radius: float) -> tuple[float, float]:
        ang = math.pi * (1.0 - frac)  # 0 → 180°(left), 1 → 0°(right)
        return cx + radius * math.cos(ang), cy - radius * math.sin(ang)

    arcs = []
    for lo, hi, color in bands:
        f0, f1 = min(lo / vmax, 1.0), min(hi / vmax, 1.0)
        if f1 <= f0:
            continue
        (x0, y0), (x1, y1) = pt(f0, r), pt(f1, r)
        large = 1 if (f1 - f0) > 0.5 else 0
        arcs.append(
            f'<path d="M {x0:.1f} {y0:.1f} A {r} {r} 0 {large} 1 '
            f'{x1:.1f} {y1:.1f}" stroke="{color}" stroke-width="14" '
            f'fill="none"><title>{lo:g}–{hi:g}</title></path>'
        )
    nx, ny = pt(v / vmax, r - 11)
    needle = (
        f'<line x1="{cx}" y1="{cy}" x2="{nx:.1f}" y2="{ny:.1f}" '
        f'stroke="#1a1a24" stroke-width="2.5"></line>'
        f'<circle cx="{cx}" cy="{cy}" r="4" fill="#1a1a24"></circle>'
    )
    lo_lbl, hi_lbl = pt(0.0, r + 13), pt(1.0, r + 13)
    return (
        f'<svg class="gauge" width="160" height="112" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">'
        f"{''.join(arcs)}{needle}"
        f'<text x="{lo_lbl[0]:.0f}" y="{cy + 12}" text-anchor="middle" '
        f'font-size="9.5" fill="#4a5568">0</text>'
        f'<text x="{hi_lbl[0]:.0f}" y="{cy + 12}" text-anchor="middle" '
        f'font-size="9.5" fill="#4a5568">{vmax:g}</text>'
        f'<text x="{cx}" y="{cy + 14}" text-anchor="middle" font-size="15" '
        f'font-weight="700" fill="#1a1a24">{fmt.format(value)}</text>'
        f'<text x="{cx}" y="{cy + 30}" text-anchor="middle" font-size="10.5" '
        f'fill="#4a5568">{_html.escape(title[:30])}'
        f"<title>{_html.escape(title)}: {fmt.format(value)}</title></text></svg>"
    )


def _svg_trend(
    series: dict[str, list[float]], title: str, width: int = 300
) -> str:
    """Per-attribute metric trend across periods (the reference stability
    tab's go.Scatter mean/stddev lines, report_generation.py) as a small
    stdlib-SVG multiple: one polyline + markers per metric, shared x =
    period index."""
    series = {k: v for k, v in series.items() if v and len(v) >= 2}
    if not series:
        return ""
    colors = {"mean": "#3b6fd4", "stddev": "#dd9a57", "kurtosis": "#3e9460"}
    h, pad_l, pad_r, pad_t, pad_b = 110, 46, 10, 22, 18
    plot_w, plot_h = width - pad_l - pad_r, h - pad_t - pad_b
    all_v = [v for vs in series.values() for v in vs if v is not None]
    lo, hi = min(all_v), max(all_v)
    span = (hi - lo) or 1.0
    n = max(len(vs) for vs in series.values())
    parts = []
    for name, vs in series.items():
        color = colors.get(name, "#6b7280")
        pts = []
        for i, v in enumerate(vs):
            if v is None:
                continue
            x = pad_l + (i / (n - 1)) * plot_w
            y = pad_t + (1 - (v - lo) / span) * plot_h
            pts.append((x, y, i, v))
        if len(pts) < 2:
            continue
        path = " ".join(f"{x:.1f},{y:.1f}" for x, y, _, _ in pts)
        parts.append(
            f'<polyline points="{path}" fill="none" stroke="{color}" '
            f'stroke-width="2"></polyline>'
        )
        parts.extend(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="2.8" fill="{color}">'
            f"<title>{_html.escape(name)} · period {i}: {_fmt(v)}</title>"
            f"</circle>"
            for x, y, i, v in pts
        )
    legend = "".join(
        f'<circle cx="{pad_l + k * 76 + 4}" cy="12" r="4" '
        f'fill="{colors.get(m, "#6b7280")}"></circle>'
        f'<text x="{pad_l + k * 76 + 12}" y="16" font-size="10" '
        f'fill="#4a5568">{_html.escape(m)}</text>'
        for k, m in enumerate(series)
    )
    return (
        f'<svg class="trend" width="{width}" height="{h}" '
        f'xmlns="http://www.w3.org/2000/svg" role="img">'
        f'<text x="0" y="16" font-size="11.5" font-weight="600" '
        f'fill="#1a1a24">{_html.escape(title[:30])}</text>{legend}'
        f'<text x="{pad_l - 6}" y="{pad_t + 8}" text-anchor="end" '
        f'font-size="9.5" fill="#4a5568">{_fmt(hi)}</text>'
        f'<text x="{pad_l - 6}" y="{h - pad_b}" text-anchor="end" '
        f'font-size="9.5" fill="#4a5568">{_fmt(lo)}</text>'
        f'<line x1="{pad_l}" y1="{h - pad_b}" x2="{width - pad_r}" '
        f'y2="{h - pad_b}" stroke="#e2e5ea"></line>{"".join(parts)}</svg>'
    )


def _section(anchor: str, title: str, parts: list[str]) -> str:
    inner = "".join(p for p in parts if p)
    return f'<section id="{anchor}"><h2>{_html.escape(title)}</h2>{inner}</section>'


def anovos_report(
    idf: DataFrame,
    output_path: str,
    label_col: str | None = None,
    event_label=1,
    drift_frames: dict[str, DataFrame] | None = None,
    stability_period_frames: list[DataFrame] | None = None,
    extra_frames: dict[str, DataFrame] | None = None,
    report_name: str = "ml_anovos_report.html",
    charts: bool = True,
    max_chart_attrs: int = 12,
    max_chart_cardinality: int = 40,
    source_df: DataFrame | None = None,
) -> str:
    """Assemble the full HTML report from the analyzer battery and write
    ``<output_path>/ml_anovos_report.html`` (reference naming,
    report_generation.py:4391).  Returns the written path.

    Sections mirror the reference's tabs: Executive Summary, Descriptive
    Statistics, Quality Check, Attribute Associations (when a label is
    given), Drift & Stability (when drift frames are passed).  Charts are
    inline SVG; tables are the stats frames themselves — all driver-sized
    (one row per attribute), so the report never pulls data rows.

    With ``charts=True`` (default) the reference's PER-ATTRIBUTE chart
    inventory (report_generation.py's charts_to_objects: frequency bars,
    event-rate bars, outlier violins, comparative drift) renders too:
    frequency + event-rate bars for each low-cardinality attribute
    (frequency_frame / event_rate_frame), one box-plot panel over the
    numeric attributes (outlier_frame — the seven box numbers, never raw
    rows), and paired source/target bars per drifted attribute when
    ``source_df`` is given.  Attribute count capped at
    ``max_chart_attrs`` (noted in the report when truncated) — every
    chart frame is a per-attribute groupBy, so cost is bounded and the
    HTML stays driver-sized.
    """
    from anovos_spark.plans.report import basic_report
    from anovos_spark.plans.report_plotly import (
        embed_figure,
        loader_script,
        plotly_bars,
        plotly_corr_heatmap,
        plotly_drift_summary,
        plotly_enabled,
        plotly_gauge,
        plotly_paired_bars,
        plotly_trend,
        plotly_violins,
    )

    # one gate for the report: plotly.js figures (same frame data) when
    # ANOVOS_SPARK_PLOTLY explicitly opts in (=1, or =auto + installed
    # plotly), else the dependency-free stdlib SVG renderers.  The
    # render_* closures keep every call site renderer-agnostic.
    use_plotly = plotly_enabled()

    def render_bars(items, title, unit=""):
        if use_plotly:
            fig = plotly_bars(items, title, unit)
            return embed_figure(fig, "bars") if fig else ""
        return _svg_bars(items, title, unit)

    def render_paired_bars(items, title, legend=("source", "target")):
        if use_plotly:
            fig = plotly_paired_bars(items, title, legend)
            return embed_figure(fig, "paired-bars") if fig else ""
        return _svg_paired_bars(items, title, legend)

    def render_gauge(value, vmax, bands, title, fmt="{:.2f}"):
        if use_plotly:
            fig = plotly_gauge(value, vmax, bands, title, fmt=fmt)
            return embed_figure(fig, "gauge") if fig else ""
        return _svg_gauge(value, vmax, bands, title, fmt=fmt)

    def render_trend(series, title):
        if use_plotly:
            fig = plotly_trend(series, title)
            return embed_figure(fig, "trend") if fig else ""
        return _svg_trend(series, title)

    battery = basic_report(idf, label_col=label_col, event_label=event_label)
    if extra_frames:
        battery.update(extra_frames)
    if charts and "correlation_matrix" not in battery:
        # the reference's association tab renders the correlation matrix
        # as a heatmap (px.imshow, report_generation.py:336-341); one
        # pairwise-co-moment agg, driver-sized result
        from anovos_spark.operators.association import correlation_matrix

        num_cols_corr = [
            f.name for f in idf.schema.fields
            if f.dataType.typeName()
            in ("integer", "long", "double", "float", "short", "decimal")
        ][:max_chart_attrs]
        if len(num_cols_corr) >= 2:
            battery["correlation_matrix"] = correlation_matrix(idf, num_cols_corr)
    pd_frames = {k: v.toPandas() for k, v in battery.items()}

    n_cols = len(idf.columns)
    gs = pd_frames.get("global_summary")
    n_rows = None
    if gs is not None and {"metric", "value"} <= set(gs.columns):
        hit = gs.loc[gs["metric"] == "rows_count", "value"]
        n_rows = None if hit.empty else int(float(hit.iloc[0]))

    # --- executive summary -------------------------------------------------
    kpis = [
        f'<div class="kpi"><b>{n_rows if n_rows is not None else "—":,}</b>'
        f"<span>rows</span></div>"
        if isinstance(n_rows, int)
        else f'<div class="kpi"><b>—</b><span>rows</span></div>',
        f'<div class="kpi"><b>{n_cols}</b><span>columns</span></div>',
    ]
    mc = pd_frames.get("measures_of_counts")
    missing_chart = ""
    if mc is not None and "missing_pct" in mc.columns:
        worst = mc.sort_values("missing_pct", ascending=False)
        missing_chart = render_bars(
            list(zip(worst["attribute"], worst["missing_pct"] * 100)),
            "Missing values by attribute",
            unit="%",
        )
    exec_parts = ["".join(kpis), missing_chart]

    # --- per-attribute chart inventory (reference charts_to_objects) ------
    freq_charts, rate_charts, outlier_chart, drift_charts = [], [], "", []
    if charts:
        from anovos_spark.plans.report_frames import (
            comparative_drift_frame,
            event_rate_frame,
            frequency_frame,
            outlier_frame,
            violin_frame,
        )

        string_cols = [
            f.name for f in idf.schema.fields
            if f.dataType.simpleString() == "string" and f.name != label_col
        ]
        num_cols = [
            f.name for f in idf.schema.fields
            if f.dataType.simpleString() in
            ("int", "bigint", "smallint", "tinyint", "float", "double")
            and f.name != label_col
        ]
        if string_cols:
            card = idf.agg(
                *[F.approx_count_distinct(c).alias(c) for c in string_cols]
            ).collect()[0]
            cat_cols = [
                c for c in string_cols if card[c] <= max_chart_cardinality
            ][:max_chart_attrs]
        else:
            cat_cols = []
        for c in cat_cols:
            fr = frequency_frame(idf, c).orderBy(F.col("count").desc()).limit(
                max_chart_cardinality
            ).toPandas()
            freq_charts.append(
                render_bars(
                    list(zip(fr[c], fr["count"])), f"Frequency — {c}"
                )
            )
            if label_col is not None:
                er = event_rate_frame(idf, c, label_col, event_label).orderBy(
                    F.col("event_rate").desc()
                ).limit(max_chart_cardinality).toPandas()
                rate_charts.append(
                    render_bars(
                        list(zip(er[c], er["event_rate"])),
                        f"Event rate — {c}", unit="%",
                    )
                )
        if num_cols:
            ofr = outlier_frame(idf, num_cols[:max_chart_attrs]).toPandas()
            vfr = violin_frame(idf, num_cols[:max_chart_attrs]).toPandas()
            densities: dict[str, list[tuple[float, float, float]]] = {}
            for _, r in vfr.iterrows():
                densities.setdefault(str(r["attribute"]), []).append(
                    (float(r["bin_lo"]), float(r["bin_hi"]), float(r["density"]))
                )
            box_items = list(
                zip(ofr["attribute"], ofr["lower_whisker"], ofr["q1"],
                    ofr["median"], ofr["q3"], ofr["upper_whisker"])
            )
            violin_title = "Outlier profile (violin + box, whiskers at 1.5·IQR)"
            if use_plotly:
                outlier_chart = embed_figure(
                    plotly_violins(box_items, densities, violin_title),
                    "violin-panel",
                )
            else:
                outlier_chart = _svg_violins(box_items, densities, violin_title)
        if source_df is not None:
            for c in cat_cols:
                # signature: (idf_target, idf_source, col)
                cd = comparative_drift_frame(idf, source_df, c).orderBy(
                    F.col("countpct_source").desc()
                ).limit(max_chart_cardinality).toPandas()
                drift_charts.append(
                    render_paired_bars(
                        list(zip(cd[c], cd["countpct_source"],
                                 cd["countpct_target"])),
                        f"Distribution drift — {c}",
                    )
                )

    # --- descriptive statistics -------------------------------------------
    stat_keys = [
        ("global_summary", "Global summary"),
        ("measures_of_counts", "Measures of counts"),
        ("measures_of_central_tendency", "Central tendency"),
        ("measures_of_cardinality", "Cardinality"),
        ("measures_of_dispersion", "Dispersion"),
        ("measures_of_percentiles", "Percentiles"),
        ("measures_of_shape", "Shape"),
    ]
    stats_parts = [
        f"<h3>{t}</h3>{_table(pd_frames[k])}" for k, t in stat_keys if k in pd_frames
    ]
    if freq_charts:
        stats_parts.append("<h3>Attribute frequency charts</h3>")
        stats_parts.extend(freq_charts)

    # --- quality check -----------------------------------------------------
    quality_keys = [
        ("duplicate_detection", "Duplicate detection"),
        ("null_rows_detection", "Null rows"),
        ("null_columns_detection", "Null columns"),
        ("idness_detection", "IDness"),
        ("biasedness_detection", "Biasedness"),
        ("outlier_detection", "Outliers"),
        ("invalid_entries_detection", "Invalid entries"),
    ]
    quality_parts = [
        f"<h3>{t}</h3>{_table(pd_frames[k])}"
        for k, t in quality_keys
        if k in pd_frames
    ]
    if outlier_chart:
        quality_parts.append(outlier_chart)

    # --- attribute associations -------------------------------------------
    assoc_parts = []
    iv = pd_frames.get("iv_calculation")
    if iv is not None and {"attribute", "iv"} <= set(iv.columns):
        ranked = iv.sort_values("iv", ascending=False)
        assoc_parts.append(
            render_bars(list(zip(ranked["attribute"], ranked["iv"])),
                      "Information value by attribute")
        )
        assoc_parts.append(f"<h3>Information value</h3>{_table(iv)}")
    ig = pd_frames.get("ig_calculation")
    if ig is not None:
        assoc_parts.append(f"<h3>Information gain</h3>{_table(ig)}")
    for k, t in [("correlation_matrix", "Correlation matrix"),
                 ("variable_clustering", "Variable clustering")]:
        if k in pd_frames:
            if k == "correlation_matrix" and charts:
                if use_plotly:
                    fig = plotly_corr_heatmap(pd_frames[k])
                    if fig:
                        assoc_parts.append(embed_figure(fig, "corr-heatmap"))
                else:
                    assoc_parts.append(_svg_corr_heatmap(pd_frames[k]))
            assoc_parts.append(f"<h3>{t}</h3>{_table(pd_frames[k])}")
    if rate_charts:
        assoc_parts.append("<h3>Event-rate charts</h3>")
        assoc_parts.extend(rate_charts)

    # --- drift & stability -------------------------------------------------
    drift_parts = []
    # drift-metric summary chart: prefer a caller-passed drift_statistics
    # frame; else compute one when a source side is available
    drift_stats_pdf = None
    for name, frame in (drift_frames or {}).items():
        pdf = frame.toPandas()
        if drift_stats_pdf is None and {"attribute", "PSI"} <= set(pdf.columns):
            drift_stats_pdf = pdf
        drift_parts.append(f"<h3>{_html.escape(name)}</h3>{_table(pdf)}")
        if charts and {"attribute", "stability_index"} <= set(pdf.columns):
            # per-attribute stability gauges (reference go.Indicator 0-4
            # panels, report_generation.py:142-160)
            gauges = "".join(
                render_gauge(
                    float(r["stability_index"]), 4.0, _SI_BANDS,
                    str(r["attribute"]),
                )
                for _, r in pdf.head(max_chart_attrs).iterrows()
                if not pd_isna(r["stability_index"])
            )
            if gauges:
                drift_parts.append(f'<div class="gauge-row">{gauges}</div>')
    if drift_stats_pdf is None and charts and source_df is not None:
        from anovos_spark.operators.drift import drift_statistics

        num_cols_all = [
            f.name for f in idf.schema.fields
            if f.dataType.simpleString() in
            ("int", "bigint", "smallint", "tinyint", "float", "double")
            and f.name != label_col
        ][:max_chart_attrs]
        if num_cols_all:
            drift_stats_pdf = drift_statistics(
                idf, source_df, list_of_cols=num_cols_all
            ).toPandas()
            drift_parts.append(
                f"<h3>Drift statistics</h3>{_table(drift_stats_pdf)}"
            )
    if drift_stats_pdf is not None and "attribute" in drift_stats_pdf.columns:
        chart_rows = []
        for _, r in drift_stats_pdf.iterrows():
            mvals = {
                m: (None if pd_isna(r.get(m)) else float(r[m]))
                for m in ("PSI", "JSD", "HD", "KS")
                if m in drift_stats_pdf.columns
            }
            chart_rows.append(
                (r["attribute"], mvals, bool(r.get("flagged", False)))
            )
        drift_title = "Drift metric summary (PSI · JSD · HD · KS)"
        if use_plotly:
            fig = plotly_drift_summary(chart_rows, 0.1, drift_title)
            summary = embed_figure(fig, "drift-summary") if fig else ""
        else:
            summary = _svg_drift_summary(chart_rows, 0.1, drift_title)
        if summary:
            drift_parts.insert(0, summary)
        # drifted-feature counter gauge (reference go.Indicator,
        # report_generation.py:1521-1535): needle at the flagged count,
        # bands at 20% / 50% of the attribute total
        n_attrs = len(chart_rows)
        n_flagged = sum(1 for _, _, fl in chart_rows if fl)
        if n_attrs:
            drift_parts.insert(0, render_gauge(
                float(n_flagged), float(n_attrs),
                [
                    (0.0, 0.2 * n_attrs, "#3e9460"),
                    (0.2 * n_attrs, 0.5 * n_attrs, "#dd9a57"),
                    (0.5 * n_attrs, float(n_attrs), "#a63d38"),
                ],
                "attributes drifted", fmt="{:.0f}",
            ))
    if stability_period_frames and len(stability_period_frames) >= 2:
        # reference stability tab: per-attribute metric TRENDS across the
        # period frames (go.Scatter lines) + the 0-4 SI gauge; one
        # single-pass aggregation per period, driver-sized results
        from anovos_spark.operators.drift import stability_index_computation

        num_cols_st = [
            f.name for f in stability_period_frames[0].schema.fields
            if f.dataType.simpleString() in
            ("int", "bigint", "smallint", "tinyint", "float", "double")
            and f.name != label_col
        ][:max_chart_attrs]
        if num_cols_st:
            per_period = []
            for frame in stability_period_frames:
                aggs = []
                for c in num_cols_st:
                    aggs += [F.mean(c).alias(f"{c}__mean"),
                             F.stddev(c).alias(f"{c}__stddev")]
                per_period.append(frame.agg(*aggs).collect()[0])
            trends = []
            for c in num_cols_st:
                series = {
                    m: [
                        None if r[f"{c}__{m}"] is None else float(r[f"{c}__{m}"])
                        for r in per_period
                    ]
                    for m in ("mean", "stddev")
                }
                trend = render_trend(series, c)
                if trend:
                    trends.append(trend)
            if trends:
                drift_parts.append("<h3>Stability trends across periods</h3>")
                drift_parts.append(f'<div class="gauge-row">{"".join(trends)}</div>')
            si_pdf = stability_index_computation(
                stability_period_frames, list_of_cols=num_cols_st
            ).toPandas()
            gauges = "".join(
                render_gauge(float(r["stability_index"]), 4.0, _SI_BANDS,
                             str(r["attribute"]))
                for _, r in si_pdf.iterrows()
                if not pd_isna(r["stability_index"])
            )
            if gauges:
                drift_parts.append(f'<div class="gauge-row">{gauges}</div>')
            drift_parts.append(f"<h3>Stability index</h3>{_table(si_pdf)}")
    if drift_charts:
        drift_parts.append("<h3>Comparative distribution charts</h3>")
        drift_parts.extend(drift_charts)

    sections, nav = [], []
    for anchor, title, parts in [
        ("summary", "Executive Summary", exec_parts),
        ("stats", "Descriptive Statistics", stats_parts),
        ("quality", "Quality Check", quality_parts),
        ("assoc", "Attribute Associations", assoc_parts),
        ("drift", "Drift & Stability", drift_parts),
    ]:
        if parts:
            sections.append(_section(anchor, title, parts))
            nav.append(f'<a href="#{anchor}">{title}</a>')

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>Anovos Report</title>"
        f"<style>{_CSS}</style></head><body>"
        "<header><h1>Anovos Data Report</h1>"
        f"<p>generated {stamp} · {n_cols} columns</p></header>"
        f"<nav>{''.join(nav)}</nav><main>{''.join(sections)}</main>"
        f"<script>{_JS}</script>"
        f"{loader_script() if use_plotly else ''}</body></html>"
    )
    os.makedirs(output_path, exist_ok=True)
    dest = os.path.join(output_path, report_name)
    with open(dest, "w", encoding="utf-8") as fh:
        fh.write(doc)
    return dest
