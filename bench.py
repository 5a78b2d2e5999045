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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from anovos_spark.queries import registry, table

    # warm the session (JVM init, file index, codegen of a trivial scan) so
    # the first timed query doesn't absorb startup cost
    table(spark, sf_dir, "lineitem").count()

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
