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
    # TIMESTAMP(NANOS) parquet is rejected by Spark's vectorized reader;
    # nanos_as_long=True reads those columns as raw nano longs (convert
    # with recast_column(..., 'timestamp_nanos') or timestamp_micros)
    if opts.pop("nanos_as_long", None):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        return spark.read.format(file_type).options(**opts).load(file_path)
    except Exception as e:
        if file_type in ("avro", "delta") and "Failed to find data source" in str(e):
            raise RuntimeError(
                f"{file_type} requires its external Spark package on the session "
                f"classpath (e.g. --packages org.apache.spark:spark-avro_2.13:<spark-version> "
                f"or io.delta:delta-spark); the reference pins spark-avro the same way "
                f"(shared/spark.py:12-23)"
            ) from e
        raise


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
        # Catalyst size estimate avoids the RDD-conversion work a
        # .rdd.getNumPartitions() probe would trigger (same pattern as
        # core.utils.fan_out).  But Catalyst sizes are grossly
        # OVERestimated after joins (and default to huge values for
        # unknown leaves), and picking coalesce off an overestimate is
        # harmful: coalesce can only shrink, so a request to repartition
        # UP silently becomes a no-op.  Repartition off an underestimate
        # is merely one extra shuffle.  So: reject implausible estimates,
        # and confirm the cheap-path coalesce decision with the real
        # partition count before committing to it.
        try:
            size = int(odf._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            max_pb = int(
                odf.sparkSession.conf.get(
                    "spark.sql.files.maxPartitionBytes", "134217728b"
                ).rstrip("b")
            )
            if size <= 0 or size >= (1 << 50):  # >1 PiB: stats default/unknown
                raise ValueError("implausible Catalyst size estimate")
            current = max(1, size // max_pb)
        except Exception:
            current = odf.rdd.getNumPartitions()
        if n_parts < current:
            current = odf.rdd.getNumPartitions()
        odf = odf.coalesce(n_parts) if n_parts < current else odf.repartition(n_parts)

    writer = odf.write.format(file_type.lower()).options(**opts).mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    writer.save(file_path)


def write_bucketed_table(
    idf: DataFrame,
    table_name: str,
    bucket_cols,
    n_buckets: int,
    sort_cols=None,
    path: str | None = None,
    file_type: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (optionally sorted) table — the co-located-join
    layout for fact tables that are repeatedly joined/aggregated on the
    same key.

    Both sides of a join bucketed on the join key with the same bucket
    count are read back WITHOUT a shuffle (and without a sort when sorted
    by the key): the scan's bucketing metadata satisfies the join's
    distribution requirement.  At 100 TB this converts every recurring
    fact-fact join from a full network shuffle into a local merge.
    Bucketing metadata lives in the catalog, so this writes via
    ``saveAsTable`` (``path`` makes it an external table)."""
    b_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = idf.write.format(file_type.lower()).mode(mode)
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(int(n_buckets), *b_cols)
    if sort_cols:
        s_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s_cols)
    writer.saveAsTable(table_name)
