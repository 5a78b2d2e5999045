"""Local differential harness: Spark queries vs DuckDB oracles.

Mimics the driver's correctness gate: for each registry entry, run the
Spark query and the DuckDB oracle at the given sf dir, then compare
row count, column names, and values (rows sorted, columns sorted by name,
floats compared to 1e-6 after both sides' round(…, 4)).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def norm_rows(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = []
    for _, r in df_pandas[cols].iterrows():
        rows.append(tuple(norm_cell(v) for v in r))
    return cols, sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from anovos_spark import oracles, queries

    import os

    cpus = os.environ.get("ORACLE_CHECK_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("ORACLE_CHECK_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables are DIRECTORIES of part files; DuckDB needs
        # the glob form for those (single-file testdata reads as-is)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qreg = queries.registry()
    oreg = oracles.registry()
    failures = []
    for name, fn in qreg.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        sql = oreg.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(sdf)}")
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        scols, srows = norm_rows(sdf)
        ocols, orows = norm_rows(odf)
        if scols != ocols:
            failures.append((name, f"schema: spark={scols} oracle={ocols}"))
            print(f"FAIL {name}: schema mismatch\n  spark : {scols}\n  oracle: {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rowcount: spark={len(srows)} oracle={len(orows)}"))
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        bad = []
        for i, (a, b) in enumerate(zip(srows, orows)):
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                        bad.append((i, a, b))
                        break
                elif x != y:
                    bad.append((i, a, b))
                    break
        if bad:
            failures.append((name, f"{len(bad)} value mismatches"))
            print(f"FAIL {name}: {len(bad)} row mismatches; first 3:")
            for i, a, b in bad[:3]:
                print(f"  row {i}\n   spark : {a}\n   oracle: {b}")
        else:
            print(f"OK   {name} ({len(srows)} rows)")

    checked = sum(1 for n in qreg if not only or n in only)
    print(f"\n{checked - len(failures)}/{checked} checked queries match"
          + ("" if not only else f" (registry has {len(qreg)})"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
