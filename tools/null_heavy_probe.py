"""Null-heavy probe: run every registry query against copies of the
test tables where ~30% of every nullable non-key column is nulled
(deterministic hash mask).  Real 100 TB data is dirty; operators must
tolerate heavy missingness — compute, skip, or refuse loudly — never
die on None arithmetic (the all-null-median crash class).

Key columns (ids, join keys) stay intact so the relational shape holds;
text/embedding/value columns all get the mask.

Usage: python tools/null_heavy_probe.py [query ...]
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

# join keys / primary ids / partition-ish columns stay non-null
KEEP = {
    "r_regionkey", "n_nationkey", "n_regionkey", "c_custkey", "c_nationkey",
    "s_suppkey", "s_nationkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "event_id", "user_id", "ts", "doc_id", "vec_id",
}

OK_ERRORS = (ValueError,)


def main():
    os.environ.setdefault("ANOVOS_EXACT_STATS", "1")
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    src = "/root/testdata/sf0.001"
    only = set(sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("null-heavy-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirty_dir = tempfile.mkdtemp(prefix="anovos_nullheavy_")
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        exprs = []
        for f in df.schema.fields:
            if f.name in KEEP:
                exprs.append(F.col(f.name))
            else:
                mask = F.pmod(F.xxhash64(F.lit(f.name), F.monotonically_increasing_id()), F.lit(10)) < 3
                exprs.append(
                    F.when(mask, F.lit(None).cast(f.dataType)).otherwise(F.col(f.name)).alias(f.name)
                )
        df.select(*exprs).coalesce(1).write.mode("overwrite").parquet(
            f"{dirty_dir}/{t}.parquet"
        )

    from anovos_spark.queries import registry

    crashes = []
    for name, fn in registry().items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, dirty_dir).count()
            print(f"OK    {name}: {n} rows")
        except OK_ERRORS as e:
            print(f"LOUD  {name}: ValueError: {str(e)[:120]}")
        except Exception as e:
            crashes.append(name)
            print(f"CRASH {name}: {type(e).__name__}: {str(e)[:200]}")
        finally:
            spark.catalog.clearCache()

    checked = sum(1 for n in registry() if not only or n in only)
    print(f"\n{checked - len(crashes)}/{checked} tolerate 30% nulls "
          f"(result or loud ValueError); crashes: {crashes}")
    spark.stop()
    sys.exit(1 if crashes else 0)


if __name__ == "__main__":
    main()
