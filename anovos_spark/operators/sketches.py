"""Mergeable-sketch operators: exact heavy hitters via bounded-state
candidate generation.

The reference's frequency analyses (mode_computation, frequency_frame,
IDness) all rely on full groupBy counts; at 100 TB a full distinct
aggregation over a high-cardinality column shuffles the entire key space.
Heavy-hitter queries ("every value above 0.1% support") don't need that:
the two-phase candidate-then-recount pattern keeps per-partition state
bounded at O(1/support) and shuffles only the candidate set.

Guarantee (why the result is EXACT, not approximate): per partition p
with n_p rows, a Misra-Gries summary with c counters retains every value
whose local count exceeds n_p/(c+1).  If a value has global count
>= support * N, then by averaging there exists a partition where its
local count >= support * n_p, which exceeds n_p/(c+1) whenever
c + 1 > 1/support — so the union of per-partition candidates is a
guaranteed superset of the true heavy hitters for any partitioning.
Phase 2 recounts ONLY the candidates (broadcast semi-join) exactly and
filters by the true threshold; false candidates drop out, nothing true
can be missing.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    idf: DataFrame,
    col: str,
    support: float = 0.001,
    margin: int = 2,
) -> DataFrame:
    """Exact frequent values of ``col`` with frequency >= support * N →
    [value, count, share], descending by count.

    Phase 1 streams each partition through a Misra-Gries summary of
    ceil(margin / support) counters (Arrow batches: per-batch
    value_counts merge into the summary, then the summary decrements
    down to capacity — classic MG step, state never exceeds capacity).
    Phase 2 broadcast-joins the candidate set and recounts exactly.
    Two scans, no full-key-space shuffle; candidate count is bounded by
    capacity x partitions regardless of column cardinality.
    """
    if not (0 < support < 1):
        raise ValueError("support must be in (0, 1)")
    capacity = int(math.ceil(margin / support))

    import pandas as pd

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts(dropna=True).items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                # MG decrement: drop the smallest (len - capacity) weights
                # from every counter — retains anything locally frequent
                excess = sorted(counters.values())[len(counters) - capacity - 1]
                counters = {
                    v: c - excess for v, c in counters.items() if c > excess
                }
        yield pd.DataFrame({col: list(counters.keys())})

    candidates = (
        idf.select(col)
        .where(F.col(col).isNotNull())
        .mapInPandas(mg_partition, schema=f"{col} {idf.schema[col].dataType.simpleString()}")
        .distinct()
    )
    total = idf.where(F.col(col).isNotNull()).count()
    threshold = support * total
    counts = (
        idf.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .where(F.col("count") >= F.lit(threshold))
    )
    return counts.select(
        F.col(col).alias("value"),
        "count",
        F.round(F.col("count") / F.lit(float(total)), 6).alias("share"),
    ).orderBy(F.col("count").desc(), F.col("value").asc())
