"""Pin a CLAIM-GRADE bench run in the DRIVER's artifact envelope.

r11 verdict #7 gave every repo-pinned BENCH_*.json the driver's
{n, rc, cpus, sf, tail, parsed} envelope.  r12 verdict #2 raises the bar:
single runs on this box carry ~±15% run-to-run variance (two same-HEAD
sf1 runs: 207.9 vs 243.8 s), so a min_of_1 point is not claim-grade and
every cross-round comparison was costing a round-trip of cache forensics.

This wrapper therefore runs bench.py REPS times (default 3; override with
--reps N or $PIN_BENCH_REPS; the driver-facing envelope stays compatible)
and pins the evidence a claim needs:

- ``parsed``   — the MEDIAN-by-total rep's summary line (so ``value`` is a
  median, not a point; ``parsed.timing`` still names bench.py's internal
  per-query min_of_2);
- ``reps``     — every rep's summary (total + probe_read_mbps box marker +
  n_errors), so warm/cold state is measured per rep, not inferred;
- ``spread``   — {min, median, max, rel} of the rep totals: the recorded
  band compare_bench.py uses to flag only outside-band deltas;
- ``timing_policy`` — e.g. "median_of_3x(min_of_2)".

The detail file (merged across reps) keeps bench.py's shape — a
``queries`` map of per-query minima (now min across ALL reps) — and adds
``band`` {query: {min, max}} over the per-rep minima plus ``box_states``
(one marker per rep).

Usage:
    python tools/pin_bench.py <sf_dir> <round> <out.json> [detail_out.json] [--reps N]
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_rep(sf_dir: str, detail_path: str) -> tuple[int, str, dict | None]:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_DETAIL"] = detail_path
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    tail = (proc.stdout or "")[-2000:]
    parsed = None
    for line in reversed((proc.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
    return proc.returncode, tail, parsed


def main() -> None:
    argv = list(sys.argv[1:])
    reps = int(os.environ.get("PIN_BENCH_REPS", "3"))
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir, rnd, out_path = argv[0], int(argv[1]), argv[2]
    detail_out = argv[3] if len(argv) > 3 else None
    detail_base = detail_out or os.path.join(ROOT, "BENCH_DETAIL.json")

    rep_rows = []  # (rc, tail, parsed, detail_dict)
    for i in range(max(reps, 1)):
        rep_detail = f"{detail_base}.rep{i + 1}"
        rc, tail, parsed = run_rep(sf_dir, rep_detail)
        detail = None
        try:
            with open(rep_detail) as fh:
                detail = json.load(fh)
            os.remove(rep_detail)
        except (OSError, json.JSONDecodeError):
            pass
        rep_rows.append((rc, tail, parsed, detail))
        v = (parsed or {}).get("value")
        probe = (parsed or {}).get("probe_read_mbps")
        print(json.dumps({"rep": i + 1, "rc": rc, "value": v,
                          "probe_read_mbps": probe}), flush=True)

    ok = [r for r in rep_rows if r[2] and isinstance(r[2].get("value"), (int, float))]
    if ok:
        totals = sorted(r[2]["value"] for r in ok)
        med = statistics.median(totals)
        # the rep whose total sits closest to the median carries the pin
        med_rc, med_tail, med_parsed, _ = min(
            ok, key=lambda r: abs(r[2]["value"] - med)
        )
        spread = {
            "min": totals[0],
            "median": round(med, 3),
            "max": totals[-1],
            "rel": round((totals[-1] - totals[0]) / med, 4) if med else None,
        }
    else:
        med_rc, med_tail, med_parsed = rep_rows[0][0], rep_rows[0][1], rep_rows[0][2]
        spread = None

    inner = (med_parsed or {}).get("timing", "min_of_?")
    envelope = {
        "n": rnd,
        "rc": max(r[0] for r in rep_rows),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf": (med_parsed or {}).get("sf"),
        "tail": med_tail,
        "parsed": med_parsed,
        "reps": [
            {
                "rc": rc,
                "value": (p or {}).get("value"),
                "probe_read_mbps": (p or {}).get("probe_read_mbps"),
                "n_errors": (p or {}).get("n_errors"),
            }
            for rc, _, p, _ in rep_rows
        ],
        "spread": spread,
        "timing_policy": f"median_of_{len(rep_rows)}x({inner})",
    }
    with open(out_path, "w") as fh:
        json.dump(envelope, fh, indent=1)
        fh.write("\n")

    if detail_out:
        # merge: per-query min across reps + the per-rep band
        details = [d for _, _, _, d in rep_rows if isinstance(d, dict)]
        queries: dict[str, float] = {}
        band: dict[str, dict] = {}
        for name in {k for d in details for k in (d.get("queries") or {})}:
            vals = [
                d["queries"][name]
                for d in details
                if isinstance((d.get("queries") or {}).get(name), (int, float))
            ]
            if vals:
                queries[name] = min(vals)
                band[name] = {"min": min(vals), "max": max(vals)}
        merged = {
            **(med_parsed or {}),
            "timing_policy": envelope["timing_policy"],
            "spread": spread,
            "queries": queries,
            "band": band,
            "box_states": [d.get("box_state") for d in details],
        }
        with open(detail_out, "w") as fh:
            json.dump(merged, fh, indent=1, sort_keys=True)
            fh.write("\n")

    print(json.dumps({"out": out_path, "rc": envelope["rc"],
                      "value": (med_parsed or {}).get("value"),
                      "spread": spread}))
    if envelope["rc"] != 0:
        sys.exit(envelope["rc"])


if __name__ == "__main__":
    main()
