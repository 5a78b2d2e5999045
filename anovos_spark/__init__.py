"""anovos_spark — a PySpark-native feature-engineering / analytics engine.

A from-scratch re-build of the capabilities of the anovos reference
(feature-engineering engine for Spark: ingest ETL, descriptive stats,
quality checking + treatment, association/target evaluation, transformers,
drift & stability, plus large-scale training-data ops: dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (Spark-first, 100 TB-ready):
- Pure DataFrame API; Catalyst/AQE owns all relational optimization.
- One-pass multi-column aggregation everywhere the reference loops per column.
- No global-window row ids, no driver toPandas on data-sized frames,
  no row-at-a-time Python UDFs in hot paths.
- Fit-type operators sample with bounded, seeded samples; apply is pure
  column expressions (whole-stage codegen).
"""

__version__ = "0.12.0"
