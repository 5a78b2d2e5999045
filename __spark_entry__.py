"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query/oracle registries — see
``anovos_spark/queries.py`` (Spark implementations) and
``anovos_spark/oracles.py`` (DuckDB-equivalent SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary (expression_parser +
    decimal-exact aggregation) on lineitem sf0.001."""
    from anovos_spark.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from anovos_spark.queries import registry

    return registry()


def oracle_sql() -> dict[str, str]:
    from anovos_spark.oracles import registry

    return registry()
