"""Basic report battery.

Reference parity: data_report/basic_report_generation.anovos_basic_report
(basic_report_generation.py:95-566) — runs the fixed analyzer battery and
persists each stats frame.  The HTML/plotly assembly (report_generation.py,
~4.4k LoC of datapane viz) is presentation, not engine — this module stops
at the structured artifacts (dict of DataFrames + optional parquet/csv
dump), which is what downstream tooling consumes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def basic_report(
    idf: DataFrame,
    label_col: str | None = None,
    event_label=1,
    output_path: str | None = None,
    output_format: str = "parquet",
) -> dict[str, DataFrame]:
    """Run the standard battery (7 stats generators + row/col quality checks
    + IV/IG when a label is given) and return {name: stats_frame}.

    With output_path set, each frame is also written (csv for driver-sized
    frames, parquet otherwise — reference writes csv via toPandas,
    report_preprocessing.py:40-128).
    """
    from anovos_spark.operators import quality, stats
    from anovos_spark.operators.association import ig_calculation, iv_calculation

    battery: dict[str, DataFrame] = {}
    battery["global_summary"] = stats.global_summary(idf)
    battery["measures_of_counts"] = stats.measures_of_counts(idf)
    battery["measures_of_central_tendency"] = stats.measures_of_central_tendency(idf)
    battery["measures_of_cardinality"] = stats.measures_of_cardinality(idf)
    battery["measures_of_dispersion"] = stats.measures_of_dispersion(idf)
    battery["measures_of_percentiles"] = stats.measures_of_percentiles(idf)
    battery["measures_of_shape"] = stats.measures_of_shape(idf)

    _, battery["duplicate_detection"] = quality.duplicate_detection(idf)
    _, battery["null_rows_detection"] = quality.null_rows_detection(idf)
    _, battery["null_columns_detection"] = quality.null_columns_detection(idf)
    _, battery["idness_detection"] = quality.idness_detection(idf)
    _, battery["biasedness_detection"] = quality.biasedness_detection(idf)
    _, battery["outlier_detection"] = quality.outlier_detection(idf)

    if label_col and label_col in idf.columns:
        battery["iv_calculation"] = iv_calculation(idf, label_col, event_label)
        battery["ig_calculation"] = ig_calculation(idf, label_col, event_label)

    if output_path:
        for name, frame in battery.items():
            dest = os.path.join(output_path, name)
            if output_format == "csv":
                frame.coalesce(1).write.mode("overwrite").option("header", True).csv(dest)
            else:
                frame.write.mode("overwrite").parquet(dest)
    return battery


# rebuild battery key -> the reference function __name__ used as the CSV
# file stem (basic_report_generation.py:199-200 writes
# `<output_path>/<func.__name__>.csv` per section)
_REFERENCE_STEMS = {
    "global_summary": "global_summary",
    "measures_of_counts": "measures_of_counts",
    "measures_of_central_tendency": "measures_of_centralTendency",
    "measures_of_cardinality": "measures_of_cardinality",
    "measures_of_dispersion": "measures_of_dispersion",
    "measures_of_percentiles": "measures_of_percentiles",
    "measures_of_shape": "measures_of_shape",
    "duplicate_detection": "duplicate_detection",
    "null_rows_detection": "nullRows_detection",
    "null_columns_detection": "nullColumns_detection",
    "outlier_detection": "outlier_detection",
    "idness_detection": "IDness_detection",
    "biasedness_detection": "biasedness_detection",
    "invalid_entries_detection": "invalidEntries_detection",
    "correlation_matrix": "correlation_matrix",
    "variable_clustering": "variable_clustering",
    "iv_calculation": "IV_calculation",
    "ig_calculation": "IG_calculation",
}


def report_bundle(
    idf: DataFrame,
    output_path: str,
    label_col: str | None = None,
    event_label=1,
    skip_corr_matrix: bool = True,
    invalid_entries_cols=None,
) -> dict[str, str]:
    """Write the reference's basic-report artifact tree: one
    ``<output_path>/<reference_func_name>.csv`` per section, reference
    naming (camelCase stems included), so downstream consumers of the
    reference's report directory can point at this engine unchanged
    (basic_report_generation.py:143-230).

    Stats frames are driver-sized (one row per column or a scalar
    battery), so pandas ``to_csv`` writes a single plain file per
    section — matching the reference's toPandas().to_csv, not a Spark
    part-file directory.  Returns {reference_stem: written_path}.
    """
    from anovos_spark.operators import quality
    from anovos_spark.operators.association import correlation_matrix
    from anovos_spark.operators.varclus import variable_clustering

    battery = basic_report(idf, label_col=label_col, event_label=event_label)
    if invalid_entries_cols:
        _, battery["invalid_entries_detection"] = quality.invalid_entries_detection(
            idf, list_of_cols=invalid_entries_cols
        )
    num_cols = [
        f.name
        for f in idf.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "double", "float", "short", "decimal")
    ]
    if not skip_corr_matrix and len(num_cols) >= 2:
        battery["correlation_matrix"] = correlation_matrix(idf, num_cols)
    if len(num_cols) >= 3:
        try:
            battery["variable_clustering"] = variable_clustering(idf, num_cols)
        except Exception:
            pass  # degenerate frames (constant columns) have no clustering

    os.makedirs(output_path, exist_ok=True)
    written: dict[str, str] = {}
    for key, frame in battery.items():
        stem = _REFERENCE_STEMS.get(key, key)
        dest = os.path.join(output_path, f"{stem}.csv")
        frame.toPandas().to_csv(dest, index=False)
        written[stem] = dest
    return written
