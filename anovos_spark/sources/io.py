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


def zorder_key(
    idf: DataFrame,
    cols,
    bits: int = 8,
    binning: str = "quantile",
    out_col: str = "__zorder__",
) -> DataFrame:
    """Attach a Z-order (Morton) curve key interleaving ``bits`` bits per
    column — the multi-column clustering key behind write-time file
    skipping (the OPTIMIZE ZORDER layout idea, built from public Spark
    primitives only).

    Each column quantizes to an integer cell in [0, 2^bits):
    - ``quantile`` (default): cell = rank bucket from 2^bits
      approxQuantile cuts (one driver-bounded job per call) — equal
      POPULATION per cell, which is what makes min/max skipping
      effective under skew;
    - ``minmax``: linear scale from one min/max agg — cheaper fit, fine
      for uniform-ish domains.

    The key itself is a pure bit-interleave expression (no UDF).  Nulls
    map to cell 0 (they sort first, clustering nulls together)."""
    from pyspark.sql import functions as F

    cols = [cols] if isinstance(cols, str) else list(cols)
    n = len(cols)
    if n < 1 or bits * n > 62:
        raise ValueError("need >=1 column and bits*len(cols) <= 62")
    cells = 1 << bits

    cell_exprs: list = []
    if binning == "quantile":
        probs = [i / cells for i in range(1, cells)]
        for c in cols:
            cuts = idf.stat.approxQuantile(c, probs, 0.001)
            # strictly increasing split points; duplicates collapse
            splits = []
            for v in cuts:
                if not splits or v > splits[-1]:
                    splits.append(v)
            expr = F.lit(0)
            for i, s in enumerate(splits):
                expr = expr + F.when(F.col(c).cast("double") > s, 1).otherwise(0)
            cell_exprs.append(F.coalesce(expr, F.lit(0)))
    elif binning == "minmax":
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
        row = idf.agg(*aggs).collect()[0]
        for i, c in enumerate(cols):
            lo, hi = row[2 * i], row[2 * i + 1]
            if lo is None or hi is None or hi <= lo:
                cell_exprs.append(F.lit(0))
                continue
            scaled = F.floor(
                (F.col(c).cast("double") - F.lit(float(lo)))
                / F.lit(float(hi - lo))
                * F.lit(float(cells))
            )
            cell_exprs.append(
                F.coalesce(
                    F.greatest(F.least(scaled, F.lit(cells - 1)), F.lit(0)), F.lit(0)
                ).cast("long")
            )
    else:
        raise ValueError("binning must be quantile|minmax")

    tmp_cols = [f"__zc{i}__" for i in range(n)]
    out = idf
    for t, e in zip(tmp_cols, cell_exprs):
        out = out.withColumn(t, e.cast("long"))
    # interleave: bit b of column c lands at position b*n + (n-1-c),
    # msb-first, so the curve alternates columns at every bit level
    key = F.lit(0).cast("long")
    for b in range(bits):
        for ci, t in enumerate(tmp_cols):
            key = key + F.shiftleft(
                F.shiftright(F.col(t), b).bitwiseAND(F.lit(1)), b * n + (n - 1 - ci)
            ).cast("long")
    return out.withColumn(out_col, key).drop(*tmp_cols)


def write_zordered(
    idf: DataFrame,
    file_path: str,
    cols,
    n_files: int,
    bits: int = 8,
    binning: str = "quantile",
    file_type: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write ``idf`` clustered along a Z-order curve over ``cols`` into
    ``n_files`` range-partitioned files.

    Every output file then covers a tight hyper-rectangle of the curve,
    so its parquet min/max footer stats are NARROW on every z-ordered
    column simultaneously — a reader filtering on ANY of them skips
    whole files/row-groups, not just on the single lead sort column a
    plain sort gives.  At 100 TB this is the difference between scanning
    a table and scanning the 1-2% of files a selective multi-column
    filter actually touches.  One range shuffle + in-partition sort;
    the curve key is dropped before writing."""
    keyed = zorder_key(idf, cols, bits=bits, binning=binning)
    (
        keyed.repartitionByRange(int(n_files), "__zorder__")
        .sortWithinPartitions("__zorder__")
        .drop("__zorder__")
        .write.format(file_type.lower())
        .mode(mode)
        .save(file_path)
    )


def compact_dataset(
    spark,
    file_path: str,
    target_file_mb: int = 256,
    file_type: str = "parquet",
    partition_by=None,
) -> dict:
    """Small-file compaction: rewrite a dataset directory so each file is
    ~``target_file_mb`` — the standing maintenance job of any long-lived
    100 TB table (streaming sinks, incremental appends, and per-batch
    partition dirs all accrete small files, and every query then pays
    per-file open/footer/seek costs plus driver listing time).

    Sizing reads the actual on-disk bytes via the Hadoop FS (not the
    Catalyst estimate, which is unreliable post-shuffle); the rewrite is
    one round-robin repartition — no sort, no skew sensitivity.  With
    ``partition_by``, files compact within each hive partition via a
    hash repartition on the partition keys (+ a salt so one giant
    partition still splits across the target file count).

    Crash-safety: the new layout lands in ``<path>__compacting`` first
    and swaps in via delete+rename, so a failure mid-rewrite leaves the
    original intact (re-run to resume); only the delete+rename window is
    non-atomic — schedule compaction when no writer appends, as every
    table-maintenance job must.  Returns {files_before, files_after,
    bytes}.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(file_path)
    fs = path.getFileSystem(conf)

    def _stats(p):
        it, n, total = fs.listFiles(p, True), 0, 0
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if not name.startswith("_") and not name.startswith("."):
                n += 1
                total += f.getLen()
        return n, total

    files_before, total_bytes = _stats(path)
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.format(file_type.lower()).load(file_path)

    tmp = file_path.rstrip("/") + "__compacting"
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(tmp_path):
        fs.delete(tmp_path, True)
    if partition_by:
        from pyspark.sql import functions as F

        from anovos_spark.core.utils import ensure_list

        keys = ensure_list(partition_by)
        # salt the repartition key: without it a single giant hive
        # partition would collapse into one task/file
        salt = F.pmod(
            F.crc32(F.monotonically_increasing_id().cast("string")),
            F.lit(max(1, n_files)),
        )
        (df.repartition(n_files, *[F.col(k) for k in keys], salt)
         .write.format(file_type.lower()).mode("overwrite")
         .partitionBy(*keys).save(tmp))
    else:
        (df.repartition(n_files).write.format(file_type.lower())
         .mode("overwrite").save(tmp))
    fs.delete(path, True)
    if not fs.rename(tmp_path, path):
        raise IOError(f"rename {tmp} -> {file_path} failed; data is at {tmp}")
    files_after, _ = _stats(path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
