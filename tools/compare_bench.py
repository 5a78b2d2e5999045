"""Compare two bench detail JSONs (per-query minima) and print the
time-ratio curve, worst first.

Usage: python tools/compare_bench.py LO_DETAIL.json HI_DETAIL.json [threshold]

Prints one line per query: ratio, hi_sec, lo_sec, name — plus a summary
of totals and any query whose ratio exceeds the threshold (default 10.0,
the fact-table data step between sf0.1 and sf1).
"""

from __future__ import annotations

import json
import sys


def minima(path):
    d = json.load(open(path))
    if isinstance(d.get("parsed"), dict):  # driver envelope (pin_bench.py)
        d = d["parsed"]
    q = d.get("queries")
    if q is None:
        # summary-only files carry no per-query minima; detail files ARE
        # the query map when no wrapper key is present
        q = {} if "metric" in d else d
    out = {}
    for k, v in q.items():
        m = v.get("min") if isinstance(v, dict) else v
        if isinstance(m, (int, float)):
            out[k] = m
    return out


def main():
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    lo, hi = minima(lo_path), minima(hi_path)
    common = sorted(set(lo) & set(hi))
    rows = []
    for name in common:
        if lo[name] <= 0:
            continue
        rows.append((hi[name] / lo[name], hi[name], lo[name], name))
    rows.sort(reverse=True)
    for r, h, l, name in rows:
        flag = "  <-- SUPER-LINEAR" if r > threshold else ""
        print(f"{r:7.2f}x  {h:8.3f}s  {l:8.3f}s  {name}{flag}")
    tot_lo = sum(lo[n] for n in common)
    tot_hi = sum(hi[n] for n in common)
    over = [name for r, _, _, name in rows if r > threshold]
    print(f"\n{len(common)} queries: total {tot_lo:.1f}s -> {tot_hi:.1f}s "
          f"({tot_hi / tot_lo:.2f}x); {len(over)} over {threshold:.0f}x"
          + (f": {', '.join(over)}" if over else ""))


if __name__ == "__main__":
    main()
