"""StatsStore: a first-class statistics catalog.

The reference threads precomputed stats between operators through ad-hoc
``stats_missing`` / ``stats_unique`` / ``stats_mode`` argument dicts wired
centrally in workflow.py:91-145.  This store formalizes that: every stats
frame is keyed by (dataset_key, stat_name), persisted as parquet in long
format, and memo-cached in-session so downstream operators reuse instead
of recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class StatsStore:
    def __init__(self, spark: SparkSession, base_path: str | None = None):
        self.spark = spark
        self.base_path = base_path
        self._cache: dict[tuple[str, str], DataFrame] = {}

    def _path(self, dataset_key: str, stat_name: str) -> str:
        return os.path.join(self.base_path, dataset_key, stat_name)

    def put(self, dataset_key: str, stat_name: str, df: DataFrame, persist: bool = True):
        self._cache[(dataset_key, stat_name)] = df
        if persist and self.base_path:
            df.write.mode("overwrite").parquet(self._path(dataset_key, stat_name))
        return df

    def get(self, dataset_key: str, stat_name: str) -> DataFrame | None:
        key = (dataset_key, stat_name)
        if key in self._cache:
            return self._cache[key]
        if self.base_path:
            path = self._path(dataset_key, stat_name)
            try:
                df = self.spark.read.parquet(path)
            except Exception:
                return None
            self._cache[key] = df
            return df
        return None

    def get_or_compute(self, dataset_key: str, stat_name: str, compute_fn) -> DataFrame:
        cached = self.get(dataset_key, stat_name)
        if cached is not None:
            return cached
        return self.put(dataset_key, stat_name, compute_fn())
