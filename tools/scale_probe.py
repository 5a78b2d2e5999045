"""Scaling probe: times every registry query at two scale factors in ONE
session (warm runs — second execution each, so codegen/JIT is excluded and
the ratio isolates the DATA-dependent cost) and reports t(sf_hi)/t(sf_lo)
against the 10x data growth.  Ratios near 1 = overhead/sample-bound; near
10 = scan-bound linear; >>10 = super-linear (a scale bug).

Usage: python tools/scale_probe.py [sf_lo_dir sf_hi_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("ANOVOS_EXACT_STATS", "0")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    lo = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    hi = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from anovos_spark.queries import registry

    out = {}
    for name, fn in registry().items():
        if only and name not in only:
            continue
        row = {}
        try:
            for tag, sf_dir in (("lo", lo), ("hi", hi)):
                fn(spark, sf_dir).count()  # warm: compile + JIT
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                row[tag] = round(time.perf_counter() - t0, 3)
                spark.catalog.clearCache()
            row["ratio"] = round(row["hi"] / row["lo"], 2) if row["lo"] else None
        except Exception as e:
            row = {"error": str(e)[:80]}
        out[name] = row
    print(json.dumps(out, indent=1))
    worst = sorted(
        ((v.get("ratio") or 0, k) for k, v in out.items()), reverse=True
    )[:8]
    print("\nhighest hi/lo ratios (10x data):", file=sys.stderr)
    for r, k in worst:
        print(f"  {r:6.2f}  {k}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
