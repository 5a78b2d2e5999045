"""Pin a bench run in the DRIVER's artifact envelope (r11 verdict #7).

The driver records each round's bench as {n, rc, cpus, sf, tail, parsed}
where `parsed` is bench.py's one-line JSON summary.  Repo-pinned sf1/sf10
artifacts used to be the raw summary line instead, so the driver's reader
parsed them to None and tools had to special-case the shapes.  This
wrapper runs bench.py exactly as the driver does and writes the same
envelope, so every BENCH_*.json carries `parsed` uniformly:

    python tools/pin_bench.py <sf_dir> <round> <out.json> [detail_out.json]

The detail file (per-query minima) is produced by bench.py itself via
SPARK_GRAFT_BENCH_DETAIL; pass detail_out to also relocate it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1]
    rnd = int(sys.argv[2])
    out_path = sys.argv[3]
    detail_out = sys.argv[4] if len(sys.argv) > 4 else None

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    if detail_out:
        env["SPARK_GRAFT_BENCH_DETAIL"] = detail_out
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
    envelope = {
        "n": rnd,
        "rc": proc.returncode,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "sf": (parsed or {}).get("sf"),
        "tail": tail,
        "parsed": parsed,
    }
    with open(out_path, "w") as fh:
        json.dump(envelope, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"out": out_path, "rc": proc.returncode,
                      "value": (parsed or {}).get("value")}))
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
