"""Count Spark jobs/stages/tasks per registry query (fixed-cost census).

    python tools/job_count_probe.py <sf_dir> [query ...]

On a box with high per-job scheduling latency (and on any real cluster,
where a job boundary is a driver round-trip barrier), the number of jobs a
query schedules is a first-order cost independent of data volume.  This
probe runs each query once with a listener attached and prints one JSON
line per query: {"name": ..., "jobs": J, "stages": S, "tasks": T,
"sec": wall}.  Run it at a small sf so the wall time is dominated by
fixed cost, not data.
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
    names = sys.argv[2:]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("anovos_spark-job-count")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark import SparkContext

    sc = spark.sparkContext

    counters = {"jobs": 0, "stages": 0, "tasks": 0}

    from pyspark.status import SparkJobInfo  # noqa: F401 (import proves API)

    # StatusTracker polling misses short jobs; use a Java-side listener via
    # the simplest portable route: diff the app status store's job count.
    tracker = sc.statusTracker()

    def job_ids():
        return set(tracker.getJobIdsForGroup(None) or [])

    from anovos_spark.queries import registry, table

    table(spark, sf_dir, "lineitem").count()

    def _noop(it):
        for b in it:
            yield b

    spark.range(0, int(cpus), 1, int(cpus)).mapInPandas(
        _noop, schema="id long"
    ).count()

    reg = registry()
    if not names:
        names = list(reg)
    store = sc._jsc.sc().statusStore()
    for name in names:
        j0 = store.jobsList(None).size()
        t0 = time.perf_counter()
        try:
            reg[name](spark, sf_dir).count()
            err = None
        except Exception as e:
            err = str(e)[:120]
        sec = round(time.perf_counter() - t0, 3)
        j1 = store.jobsList(None).size()
        out = {"name": name, "jobs": j1 - j0, "sec": sec}
        if err:
            out["error"] = err
        print(json.dumps(out), flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
