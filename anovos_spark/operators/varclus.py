"""Variable clustering (VarClusHi-style divisive PCA clustering).

Reference parity: association_evaluator.variable_clustering
(association_evaluator.py:142-250) + association_eval_varclus.py:11-450,
itself a port of the VarClusHi package (public PyPI project implementing
SAS PROC VARCLUS semantics).

Split of labor (same as the reference): the only data-sized computation is
the correlation matrix — computed here in ONE Spark aggregation of
pairwise F.corr (the reference assembles vectors and calls
RowMatrix.computeCovariance, :84); everything after runs on the driver on
a p×p numpy matrix (p = #columns, driver-scale by definition).

Algorithm (PROC VARCLUS, maxeigval2 criterion):
1. start with all variables in one cluster;
2. find the cluster whose 2nd principal-component eigenvalue exceeds
   ``maxeigval2`` (default 1.0); split it by the rotated first two PCs —
   each variable goes to the component it correlates with more strongly;
3. repeat until every cluster's 2nd eigenvalue ≤ maxeigval2;
4. output per variable: cluster id, RS_own (R² with own cluster's PC1),
   RS_next (max R² with any other cluster's PC1), and
   RS_Ratio = (1 − RS_own)/(1 − RS_next).

Preprocessing matches the reference: label-encode categoricals + MMM-impute
nulls (association_evaluator.py:229-234).
"""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anovos_spark.core.typing import resolve_columns


def _correlation_matrix_np(idf: DataFrame, cols: list[str]) -> np.ndarray:
    """p×p Pearson correlation matrix from ONE Spark aggregation."""
    pairs = list(itertools.combinations(range(len(cols)), 2))
    aggs = [F.corr(cols[i], cols[j]).alias(f"c_{i}_{j}") for i, j in pairs]
    row = idf.agg(*aggs).collect()[0] if aggs else {}
    p = len(cols)
    m = np.eye(p)
    for i, j in pairs:
        v = row[f"c_{i}_{j}"]
        m[i, j] = m[j, i] = 0.0 if v is None else v
    return m


def _pc_loadings(corr: np.ndarray, idx: list[int], n_comp: int = 2):
    """Eigen-decomposition of the sub-correlation-matrix; returns
    (eigvals desc, loadings[p, n_comp])."""
    sub = corr[np.ix_(idx, idx)]
    w, v = np.linalg.eigh(sub)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    return w, v[:, :n_comp]


def variable_clustering(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    maxeigval2: float = 1.0,
    max_clusters: int = 20,
    sample_size: int = 1_000_000,
    seed: int = 42,
) -> DataFrame:
    """[cluster, attribute, RS_ratio] variable clustering.

    Categorical columns are label-encoded and nulls median-imputed before
    correlation (reference preprocessing, association_evaluator.py:229-234).
    """
    from anovos_spark.operators.transformers import (
        imputation_MMM,
        label_encoding_apply,
        label_encoding_fit,
    )

    num_cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    cat_cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="categorical")
    df = idf
    if cat_cols:
        enc = label_encoding_fit(df, cat_cols)
        df = label_encoding_apply(df, enc)
    cols = num_cols + [c for c in cat_cols if c in df.columns]
    df, _ = imputation_MMM(df.select(cols), cols, method_type="median")

    total = df.count()
    if total > sample_size:
        df = df.sample(False, sample_size / total, seed)
    df.persist()
    corr = _correlation_matrix_np(df, cols)
    df.unpersist()

    # ---- divisive clustering on the driver ---------------------------- #
    clusters: list[list[int]] = [list(range(len(cols)))]
    while len(clusters) < max_clusters:
        # candidate: cluster with largest 2nd eigenvalue above threshold
        best_i, best_ev2 = None, maxeigval2
        for i, idx in enumerate(clusters):
            if len(idx) < 2:
                continue
            w, _ = _pc_loadings(corr, idx)
            if len(w) > 1 and w[1] > best_ev2:
                best_i, best_ev2 = i, w[1]
        if best_i is None:
            break
        idx = clusters.pop(best_i)
        _, load = _pc_loadings(corr, idx)
        # assign each variable to the rotated component it loads on harder
        g1 = [v for k, v in enumerate(idx) if abs(load[k, 0]) >= abs(load[k, 1])]
        g2 = [v for k, v in enumerate(idx) if abs(load[k, 0]) < abs(load[k, 1])]
        if not g1 or not g2:
            # degenerate split: keep as one cluster, stop splitting it
            clusters.append(idx)
            break
        clusters += [g1, g2]

    # ---- RS ratios ----------------------------------------------------- #
    # R²(var, cluster PC1) = (Σ_j load1_j · corr[var, j])² / eigval1
    def pc1(idx):
        w, v = _pc_loadings(corr, idx, 1)
        return w[0], v[:, 0]

    pcs = [pc1(idx) for idx in clusters]
    rows = []
    for ci, idx in enumerate(clusters):
        for v in idx:
            rs = []
            for cj, (w1, load) in enumerate(pcs):
                jdx = clusters[cj]
                num = float(np.dot(load, corr[v, jdx])) ** 2
                r2 = num / w1 if w1 > 0 else 0.0
                rs.append(min(r2, 1.0))
            rs_own = rs[ci]
            rs_next = max((r for j, r in enumerate(rs) if j != ci), default=0.0)
            denom = 1.0 - rs_next
            ratio = (1.0 - rs_own) / denom if denom > 1e-12 else float("inf")
            rows.append((ci, cols[v], round(float(ratio), 6)))

    spark = idf.sparkSession
    return spark.createDataFrame(
        rows, schema="cluster int, attribute string, RS_ratio double"
    )
