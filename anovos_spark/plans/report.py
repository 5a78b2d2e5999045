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
