"""Lazy SparkSession management.

The reference builds its session eagerly at import time
(reference: shared/spark.py:26-97) — an anti-pattern this engine replaces
with an explicit, lazily-created, configurable builder.  Nothing in this
package ever creates a session implicitly; operators take DataFrames and
use ``df.sparkSession`` when they need one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# Defaults tuned for a large cluster but harmless on local[*]:
# AQE handles skew/coalescing at runtime; 200 shuffle partitions is Spark's
# default and is overridden per-environment (tests use 32 to match cores).
DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # one python worker runs per executor core already — an unpinned BLAS
    # would spawn n_cores threads in EACH worker (n² total) and thrash
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def get_session(
    app_name: str = "anovos_spark",
    master: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Get or create a SparkSession with engine defaults applied."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
