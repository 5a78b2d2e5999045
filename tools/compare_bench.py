"""Compare two bench detail JSONs (per-query minima) and print the
time-ratio curve, worst first.

Usage: python tools/compare_bench.py LO_DETAIL.json HI_DETAIL.json [threshold]

Prints one line per query: ratio, hi_sec, lo_sec, name — plus a summary
of totals and any query whose ratio exceeds the threshold (default 10.0,
the fact-table data step between sf0.1 and sf1).

Band-aware (r12 verdict #2): when a file was pinned by tools/pin_bench.py
with N>=2 reps it carries a per-query ``band`` {name: {min, max}} and a
total ``spread``.  A query is then flagged only when its delta is outside
the recorded band — i.e. the most favorable cross-band ratio
(hi.band.min / lo.band.max) still exceeds the threshold — so single-run
noise inside the measured variance stops generating forensics.  Files
without bands degrade to the raw point ratio.
"""

from __future__ import annotations

import json
import sys

SUMMARY_KEYS = {"metric", "value", "unit"}


def load(path):
    """Return (minima, band, spread) for a bench artifact of any pinned
    shape: driver envelope, pin_bench merged detail, raw bench detail, or
    summary-only (no per-query data)."""
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict):  # driver envelope (pin_bench.py)
        d = d["parsed"]
    band = d.get("band") if isinstance(d.get("band"), dict) else {}
    spread = d.get("spread") if isinstance(d.get("spread"), dict) else None
    q = d.get("queries")
    if not isinstance(q, dict):
        # A summary-only file (bench.py's stdout line) has metric/value/unit
        # as SCALAR fields and carries no per-query minima.  A wrapper-less
        # detail file IS the query map — even one that happens to contain a
        # query named 'metric' (its value is a dict/number, not the
        # metric-name string).
        is_summary = (
            isinstance(d.get("metric"), str)
            and SUMMARY_KEYS <= set(d)
            and isinstance(d.get("value"), (int, float))
        )
        q = {} if is_summary else d
    out = {}
    for k, v in q.items():
        m = v.get("min") if isinstance(v, dict) else v
        if isinstance(m, (int, float)):
            out[k] = m
    return out, band, spread


def main():
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lo, lo_band, lo_spread = load(lo_path)
    hi, hi_band, hi_spread = load(hi_path)
    common = sorted(set(lo) & set(hi))
    rows = []
    for name in common:
        if lo[name] <= 0:
            continue
        ratio = hi[name] / lo[name]
        # banded ratio: most favorable reading across both recorded bands;
        # equals the raw ratio when neither side has a band
        lo_hi_edge = (lo_band.get(name) or {}).get("max", lo[name])
        hi_lo_edge = (hi_band.get(name) or {}).get("min", hi[name])
        banded = hi_lo_edge / lo_hi_edge if lo_hi_edge > 0 else ratio
        rows.append((ratio, banded, hi[name], lo[name], name))
    rows.sort(reverse=True)
    for r, rb, h, l, name in rows:
        flag = "  <-- SUPER-LINEAR" if rb > threshold else ""
        extra = f" (banded {rb:.2f}x)" if rb != r else ""
        print(f"{r:7.2f}x  {h:8.3f}s  {l:8.3f}s  {name}{extra}{flag}")
    tot_lo = sum(lo[n] for n in common)
    tot_hi = sum(hi[n] for n in common)
    over = [name for _, rb, _, _, name in rows if rb > threshold]
    tot_ratio = f"{tot_hi / tot_lo:.2f}x" if tot_lo > 0 else "n/a"
    print(f"\n{len(common)} queries: total {tot_lo:.1f}s -> {tot_hi:.1f}s "
          f"({tot_ratio}); {len(over)} over {threshold:.0f}x"
          + (" (outside recorded bands)" if lo_band or hi_band else "")
          + (f": {', '.join(over)}" if over else ""))
    for label, spread in (("lo", lo_spread), ("hi", hi_spread)):
        if spread:
            print(f"{label} spread: min {spread.get('min')} / median "
                  f"{spread.get('median')} / max {spread.get('max')} "
                  f"(rel {spread.get('rel')})")


if __name__ == "__main__":
    main()
