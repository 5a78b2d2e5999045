"""Capture .explain('formatted') for registry queries into plans/<tag>/.

    python tools/capture_plans.py <sf_dir> <tag_suffix> <query> [query ...]

Writes plans/r13/<query>_<tag_suffix>.txt (tag_suffix: before|after).
Uses the same session config as bench.py so plan shapes (AQE, shuffle
partitions) match what the bench executes.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    os.environ.setdefault("ANOVOS_EXACT_STATS", "0")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    sf_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("anovos_spark-capture-plans")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from anovos_spark.queries import registry

    out_dir = os.path.join(ROOT, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    reg = registry()
    for name in names:
        try:
            df = reg[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # a query that can't even plan is a finding
            text = f"EXPLAIN FAILED: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
