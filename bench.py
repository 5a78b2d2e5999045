"""Benchmark runner: times every registry query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "total_query_sec", "value": N, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

os_environ_default = ("ANOVOS_EXACT_STATS", "0")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    os.environ.setdefault(*os_environ_default)
    # pin BLAS threading before numpy/Spark start: python workers fork from
    # this process, and 32 workers × 32 OpenBLAS threads would thrash
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("anovos_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
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

    # warm the session so the first timed query doesn't absorb startup cost:
    # JVM init + file index (scan), and the Python/Arrow worker pool — the
    # first pandas stage in a session forks one worker per core and imports
    # pandas/numpy in each; that's session bootstrap, not query cost
    table(spark, sf_dir, "lineitem").count()
    import pandas as _pd

    def _noop(it):
        for b in it:
            yield b

    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        _noop, schema="id long"
    ).count()

    timings = {}
    for name, fn in registry().items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            timings[name] = None
            print(f"bench error {name}: {e}", file=sys.stderr)
        # queries cache what they internally reuse and hand back a lazy
        # result; drop those pinned blocks so query K's leftover storage
        # never squeezes query K+1's execution memory
        spark.catalog.clearCache()

    total = round(sum(v for v in timings.values() if v is not None), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
