"""Time a SUBSET of registry queries with bench.py's exact discipline
(same session config, approx-stats env, warmup, clearCache between runs,
min-of-N) — for adjudicating individual per-query deltas without paying
a full 162-query sweep per data point.

    python tools/bench_subset.py <sf_dir> <runs> <query> [query ...]

Prints one JSON line: {"sf_dir": ..., "runs": N, "queries": {name:
{"runs": [...], "min": s}}}.
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    os.environ.setdefault("ANOVOS_EXACT_STATS", "0")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    sf_dir = sys.argv[1]
    n_runs = int(sys.argv[2])
    names = sys.argv[3:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("anovos_spark-bench-subset")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from anovos_spark.queries import registry, table

    table(spark, sf_dir, "lineitem").count()

    def _noop(it):
        for b in it:
            yield b

    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        _noop, schema="id long"
    ).count()

    reg = registry()
    out = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"runs": runs, "min": min(runs)}
    print(json.dumps({"sf_dir": sf_dir, "runs": n_runs, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
