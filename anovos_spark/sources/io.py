"""Generic dataset read/write.

Reference parity: read_dataset / write_dataset
(reference: data_ingest/data_ingest.py:23-117).  Formats: csv, parquet,
json, avro, orc, delta-if-available.  Paths may be local, s3a://, abfss://,
hdfs:// — the scheme is handed straight to Spark's DataSource V2 resolution
so predicate pushdown / partition pruning apply automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_KNOWN_FORMATS = {"csv", "parquet", "json", "avro", "orc", "delta", "text"}


def read_dataset(
    spark: SparkSession,
    file_path: str,
    file_type: str = "parquet",
    file_configs: dict | None = None,
) -> DataFrame:
    """Load a dataset of the given format with per-format options.

    csv defaults header=True, inferSchema=True like the reference
    (data_ingest.py:41-50) unless overridden.
    """
    file_type = file_type.lower()
    if file_type not in _KNOWN_FORMATS:
        raise ValueError(f"unsupported file_type {file_type!r}; one of {sorted(_KNOWN_FORMATS)}")
    opts = dict(file_configs or {})
    if file_type == "csv":
        opts.setdefault("header", "True")
        opts.setdefault("inferSchema", "True")
    return spark.read.format(file_type).options(**opts).load(file_path)


def write_dataset(
    idf: DataFrame,
    file_path: str,
    file_type: str = "parquet",
    file_configs: dict | None = None,
    column_order: list[str] | None = None,
) -> None:
    """Save a dataset; supports mode/compression/repartition options.

    `repartition` shrinking uses coalesce (narrow, no shuffle) and growing
    uses repartition, mirroring data_ingest.py:108-117.  `partitionBy` in
    file_configs maps to a partitioned layout for partition pruning at read.
    """
    if file_type.lower() not in _KNOWN_FORMATS:
        raise ValueError(
            f"unsupported file_type {file_type!r}; one of {sorted(_KNOWN_FORMATS)}"
        )
    opts = dict(file_configs or {})
    mode = opts.pop("mode", "error")
    n_parts = opts.pop("repartition", None)
    partition_by = opts.pop("partitionBy", None)

    odf = idf.select(column_order) if column_order else idf
    if n_parts is not None:
        n_parts = int(n_parts)
        current = odf.rdd.getNumPartitions()
        odf = odf.coalesce(n_parts) if n_parts < current else odf.repartition(n_parts)

    writer = odf.write.format(file_type.lower()).options(**opts).mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.save(file_path)
