"""Query registry: every implemented operator exposed as (spark, sf_dir) → DataFrame.

Each entry has a matching ANSI-SQL oracle in ``anovos_spark.oracles`` (run by
the driver on DuckDB over the same parquet).  Column names/aliases must match
the oracle exactly — the correctness gate hashes values after sorting columns
by name.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from anovos_spark.operators import stats


def _exact() -> bool:
    """Correctness gate runs exact percentiles/distincts (oracle-matched);
    bench.py flips this env to measure the approx production path (the
    reference's own scale posture: approxQuantile err 0.01, HLL rsd 0.05)."""
    return os.environ.get("ANOVOS_EXACT_STATS", "1") == "1"

# lineitem semantic split (fixed, documented here so oracles stay in sync)
LINEITEM_NUM = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
]
LINEITEM_DISCRETE = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_global_summary(spark, sf_dir):
    return stats.global_summary(table(spark, sf_dir, "lineitem"))


def q_counts(spark, sf_dir):
    return stats.measures_of_counts(table(spark, sf_dir, "lineitem"))


def q_nonzero(spark, sf_dir):
    return stats.nonzero_count(table(spark, sf_dir, "lineitem"))


def q_central_tendency(spark, sf_dir):
    return stats.measures_of_central_tendency(table(spark, sf_dir, "lineitem"), exact=_exact())


def q_cardinality(spark, sf_dir):
    return stats.measures_of_cardinality(table(spark, sf_dir, "lineitem"), exact=_exact())


def q_dispersion(spark, sf_dir):
    return stats.measures_of_dispersion(table(spark, sf_dir, "lineitem"), exact=_exact())


def q_percentiles(spark, sf_dir):
    return stats.measures_of_percentiles(table(spark, sf_dir, "lineitem"), exact=_exact())


def q_shape(spark, sf_dir):
    return stats.measures_of_shape(table(spark, sf_dir, "lineitem"))


# --------------------------------------------------------------------------- #
# quality checker
# --------------------------------------------------------------------------- #
DUP_SUBSET = ["l_suppkey", "l_returnflag", "l_linestatus"]


def q_duplicates(spark, sf_dir):
    from anovos_spark.operators.quality import duplicate_detection

    _, stats = duplicate_detection(table(spark, sf_dir, "lineitem"), DUP_SUBSET)
    return stats


def q_null_rows(spark, sf_dir):
    from anovos_spark.operators.quality import null_rows_detection

    _, stats = null_rows_detection(table(spark, sf_dir, "lineitem"))
    return stats


def q_outliers(spark, sf_dir):
    from anovos_spark.operators.quality import outlier_detection

    _, stats = outlier_detection(
        table(spark, sf_dir, "lineitem"), min_validation=2, exact=_exact()
    )
    return stats


def q_idness(spark, sf_dir):
    from anovos_spark.operators.quality import idness_detection

    _, stats = idness_detection(table(spark, sf_dir, "orders"), exact=_exact())
    return stats


def q_biasedness(spark, sf_dir):
    from anovos_spark.operators.quality import biasedness_detection

    _, stats = biasedness_detection(table(spark, sf_dir, "lineitem"))
    return stats


def q_invalid_entries(spark, sf_dir):
    from anovos_spark.operators.quality import invalid_entries_detection

    _, stats = invalid_entries_detection(table(spark, sf_dir, "customer"))
    return stats


def registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "global_summary": q_global_summary,
        "measures_of_counts": q_counts,
        "nonzero_count": q_nonzero,
        "central_tendency": q_central_tendency,
        "cardinality": q_cardinality,
        "dispersion": q_dispersion,
        "percentiles": q_percentiles,
        "shape": q_shape,
        "duplicate_detection": q_duplicates,
        "null_rows_detection": q_null_rows,
        "outlier_detection": q_outliers,
        "idness_detection": q_idness,
        "biasedness_detection": q_biasedness,
        "invalid_entries_detection": q_invalid_entries,
    }
