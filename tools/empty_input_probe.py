"""Empty-input probe: run every registry query against ZERO-ROW copies
of the test tables (schemas preserved).  At 100 TB a filter can
legitimately produce an empty partition or an empty frame; operators
must either return a sane (possibly empty) result or refuse with a
clear ValueError — never die with an IndexError / KeyError /
ZeroDivisionError / opaque Py4J traceback (the all-null-median crash
class).

Usage: python tools/empty_input_probe.py [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# loud, documented refusals on empty/degenerate input are CORRECT
OK_ERRORS = (ValueError,)


def main():
    os.environ.setdefault("ANOVOS_EXACT_STATS", "1")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    src = "/root/testdata/sf0.001"
    only = set(sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("empty-input-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    empty_dir = tempfile.mkdtemp(prefix="anovos_empty_")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            f"{empty_dir}/{t}.parquet"
        )

    from anovos_spark.queries import registry

    crashes = []
    for name, fn in registry().items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, empty_dir).count()
            print(f"OK    {name}: {n} rows")
        except OK_ERRORS as e:
            print(f"LOUD  {name}: ValueError: {str(e)[:120]}")
        except Exception as e:
            crashes.append(name)
            print(f"CRASH {name}: {type(e).__name__}: {str(e)[:200]}")
        finally:
            spark.catalog.clearCache()

    checked = sum(1 for n in registry() if not only or n in only)
    print(f"\n{checked - len(crashes)}/{checked} handle empty input "
          f"(sane result or loud ValueError); crashes: {crashes}")
    spark.stop()
    sys.exit(1 if crashes else 0)


if __name__ == "__main__":
    main()
