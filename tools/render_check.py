"""Renderability check for the two report variants (r9).

This container ships no browser engine (no Chromium/WebKit/Firefox) and
no JS runtime (Java 17 dropped Nashorn), so a true headless hydration
pass isn't possible here; this check does everything short of that:

SVG variant:
  - every ``<svg>`` block parses as well-formed XML;
  - every chart svg contains drawable elements (rect/path/circle/line/
    polyline/text) — a blank-chart regression fails loudly;
  - the one engine-authored ``<script>`` block is the only script tag
    (injection barrier unchanged).

Plotly variant:
  - every ``.plotly-fig`` div carries exactly one
    ``<script type="application/json">`` payload;
  - each payload json-parses and has non-empty ``data`` plus ``layout``
    (what Plotly.newPlot consumes verbatim);
  - figure JSON never contains an unescaped ``</`` (the embed barrier);
  - the loader script tag is present, carries crossorigin=anonymous,
    and hydrates via DOMContentLoaded → Plotly.newPlot per div.

Usage:
    python tools/gen_render_fixture.py          # build .render_check/
    python tools/render_check.py [round_no]     # -> RENDER_CHECK_r{N}.json
"""
from __future__ import annotations

import json
import os
import re
import sys
import xml.etree.ElementTree as ET

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRAWABLE = ("rect", "path", "circle", "line", "polyline", "polygon", "text")


def check_svg(path: str) -> dict:
    html = open(path, encoding="utf-8").read()
    svgs = re.findall(r"<svg\b.*?</svg>", html, flags=re.S)
    parsed = drawable = 0
    errors: list[str] = []
    for i, block in enumerate(svgs):
        try:
            root = ET.fromstring(block)
            parsed += 1
            tags = {el.tag.split("}")[-1] for el in root.iter()}
            if tags & set(DRAWABLE):
                drawable += 1
            else:
                errors.append(f"svg #{i}: no drawable elements")
        except ET.ParseError as e:
            errors.append(f"svg #{i}: {e}")
    n_scripts = len(re.findall(r"<script\b", html))
    return {
        "file": os.path.relpath(path, ROOT),
        "n_svg": len(svgs),
        "n_svg_parsed": parsed,
        "n_svg_drawable": drawable,
        "n_script_tags": n_scripts,
        "errors": errors,
    }


def check_plotly(path: str) -> dict:
    html = open(path, encoding="utf-8").read()
    figs = re.findall(
        r'<div class="plotly-fig[^"]*">\s*<script type="application/json">'
        r"(.*?)</script>",
        html,
        flags=re.S,
    )
    ok = 0
    errors: list[str] = []
    for i, payload in enumerate(figs):
        try:
            fig = json.loads(payload)
            assert fig.get("data"), "empty data"
            assert isinstance(fig.get("layout"), dict), "no layout"
            assert "</" not in payload, "unescaped </ in payload"
            ok += 1
        except Exception as e:  # noqa: BLE001 — collect, report below
            errors.append(f"fig #{i}: {e}")
    loader_ok = (
        "Plotly.newPlot" in html
        and "DOMContentLoaded" in html
        and 'crossorigin="anonymous"' in html
    )
    if not loader_ok:
        errors.append("loader script missing or lacks crossorigin")
    return {
        "file": os.path.relpath(path, ROOT),
        "n_plotly_figs": len(figs),
        "n_figs_valid": ok,
        "loader_ok": loader_ok,
        "errors": errors,
    }


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    svg = check_svg(os.path.join(ROOT, ".render_check/svg/ml_anovos_report.html"))
    plo = check_plotly(
        os.path.join(ROOT, ".render_check/plotly/ml_anovos_report.html")
    )
    result = {
        "round": rnd,
        "browser": "none available in container (structural check only; "
        "see module docstring)",
        "svg_variant": svg,
        "plotly_variant": plo,
        "pass": not svg["errors"]
        and not plo["errors"]
        and svg["n_svg"] > 0
        and svg["n_svg"] == svg["n_svg_drawable"]
        and plo["n_plotly_figs"] > 0
        and plo["n_plotly_figs"] == plo["n_figs_valid"],
    }
    out = os.path.join(ROOT, f"RENDER_CHECK_r{rnd:02d}.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result, indent=1))
    sys.exit(0 if result["pass"] else 1)


if __name__ == "__main__":
    main()
