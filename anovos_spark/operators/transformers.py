"""Transformers: binning, encoding, scaling, imputation, category collapse,
math features, expression parser.

Reference parity: transformers.py (attribute_binning :87, cat_to_num_unsupervised
:506, cat_to_num_supervised :776, z_standardization :965, IQR_standardization
:1102, normalization :1233, imputation_MMM :1369, outlier_categories :3489,
feature_transformation :3171, expression_parser :3674).

Architecture (Spark-first, 100 TB):
- Every *apply* is a pure column expression built from a small fitted model
  (python dict / tiny frame collected from ONE aggregation job).  No
  monotonically_increasing_id + join reattachment (reference
  transformers.py:1302-1340), no RDD round-trips (:723-728), no UDF bin
  scanning (:248-280) — whole-stage codegen end to end.
- Fit/apply separation: each fit returns a plain dict model; ``apply_*``
  takes the model so pipelines can persist/reuse (reference
  pre_existing_model/model_path pattern).
- output_mode ∈ {replace, append}: append adds ``{col}{suffix}`` columns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anovos_spark.core.typing import resolve_columns
from anovos_spark.core.utils import fan_out


def _out(idf: DataFrame, exprs: dict[str, Column], output_mode: str, suffix: str) -> DataFrame:
    """Apply per-column expressions as replace or append — single select."""
    if output_mode == "replace":
        cols = [exprs[c].alias(c) if c in exprs else F.col(c) for c in idf.columns]
        return idf.select(*cols)
    if output_mode == "append":
        cols = [F.col(c) for c in idf.columns] + [
            exprs[c].alias(f"{c}{suffix}") for c in exprs
        ]
        return idf.select(*cols)
    raise ValueError(f"output_mode must be replace|append, got {output_mode!r}")


# --------------------------------------------------------------------------- #
# binning
# --------------------------------------------------------------------------- #
def binning_fit(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    method_type: str = "equal_range",
    bin_size: int = 10,
    exact: bool = True,
) -> dict:
    """Fit bin cutoffs per column in ONE aggregation job
    (reference: transformers.py:210-246).

    equal_range: (min, max) → uniform width.  equal_frequency: interior
    quantile cutoffs at i/bin_size.
    Model: {col: {"method": ..., "bin_size": n, "min": m, "max": M} |
            {"method": ..., "cutoffs": [c1..c_{n-1}]}}
    """
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    aggs = []
    if method_type == "equal_range":
        for c in cols:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
    elif method_type == "equal_frequency":
        pts = [i / bin_size for i in range(1, bin_size)]
        arr = "array(" + ", ".join(str(p) for p in pts) + ")"
        fn = "percentile" if exact else "percentile_approx"
        acc = "" if exact else ", 100"
        for c in cols:
            aggs.append(F.expr(f"{fn}(`{c}`, {arr}{acc})").alias(f"{c}__cut"))
    else:
        raise ValueError("method_type must be equal_range|equal_frequency")
    row = idf.agg(*aggs).collect()[0]
    model = {}
    for c in cols:
        if method_type == "equal_range":
            model[c] = {
                "method": method_type,
                "bin_size": bin_size,
                "min": row[f"{c}__min"],
                "max": row[f"{c}__max"],
            }
        else:
            model[c] = {
                "method": method_type,
                "bin_size": bin_size,
                "cutoffs": list(row[f"{c}__cut"] or []),
            }
    return model


def binning_apply(
    idf: DataFrame, model: dict, output_mode: str = "replace"
) -> DataFrame:
    """Assign 1-based bin indices from a fitted model — pure expressions
    (replaces the reference's per-row UDF binary scan, transformers.py:248-280).

    equal_range: least(n, floor((x−min)/width)+1); equal_frequency:
    1 + Σ (x > cutoff_i).  Nulls stay null.
    """
    exprs: dict[str, Column] = {}
    for c, m in model.items():
        x = F.col(c)
        if m["method"] == "equal_range":
            lo, hi, n = m["min"], m["max"], m["bin_size"]
            if lo is None or hi is None or hi == lo:
                e = F.when(x.isNotNull(), F.lit(1))
            else:
                width = (hi - lo) / n
                e = F.least(
                    F.lit(n), F.floor((x - F.lit(lo)) / F.lit(width)) + 1
                )
                e = F.greatest(F.lit(1), e)  # clamp values below fitted min
            exprs[c] = F.when(x.isNull(), F.lit(None).cast("int")).otherwise(
                e.cast("int")
            )
        else:
            b = F.lit(1)
            for cut in m["cutoffs"]:
                b = b + (x > F.lit(cut)).cast("int")
            exprs[c] = F.when(x.isNull(), F.lit(None).cast("int")).otherwise(
                b.cast("int")
            )
    return _out(idf, exprs, output_mode, "_binned")


def attribute_binning(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    method_type: str = "equal_range",
    bin_size: int = 10,
    output_mode: str = "replace",
    exact: bool = True,
) -> tuple[DataFrame, dict]:
    model = binning_fit(idf, list_of_cols, drop_cols, method_type, bin_size, exact)
    return binning_apply(idf, model, output_mode), model


# --------------------------------------------------------------------------- #
# categorical encodings
# --------------------------------------------------------------------------- #
def label_encoding_fit(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    index_order: str = "frequencyDesc",
    cardinality_threshold: int = 50,
) -> dict:
    """Fit label-encoding maps for categorical columns
    (reference: transformers.py:506-773 StringIndexer path).

    Deterministic: frequencyDesc ties → value asc; alphabetAsc/Desc by value.
    ONE job fits all columns (melt → groupBy(attribute, value) → window),
    versus per-column StringIndexer fits.  Columns above
    cardinality_threshold are skipped (reference :513).
    Model: {col: {value: index}} with 0-based indices.
    """
    from anovos_spark.core.utils import melt

    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="categorical")
    long_df = melt(idf.select(cols), [], cols, "attribute", "value")
    counts = (
        long_df.where(F.col("value").isNotNull())
        .groupBy("attribute", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if index_order == "frequencyDesc":
        order = [F.col("cnt").desc(), F.col("value").asc()]
    elif index_order == "alphabetAsc":
        order = [F.col("value").asc()]
    elif index_order == "alphabetDesc":
        order = [F.col("value").desc()]
    else:
        raise ValueError("index_order must be frequencyDesc|alphabetAsc|alphabetDesc")
    w = Window.partitionBy("attribute").orderBy(*order)
    # Apply the cardinality threshold IN the plan (count of distinct values per
    # attribute via an unordered window) so an ID-like column never ships its
    # mappings to the driver — the threshold exists to prevent exactly that.
    w_card = Window.partitionBy("attribute")
    mapping = (
        counts.withColumn("n_distinct", F.count(F.lit(1)).over(w_card))
        .where(F.col("n_distinct") <= F.lit(cardinality_threshold))
        .withColumn("index", F.row_number().over(w) - 1)
    )
    model: dict[str, dict] = {}
    for r in mapping.collect():
        model.setdefault(r["attribute"], {})[r["value"]] = r["index"]
    return model


def label_encoding_apply(
    idf: DataFrame, model: dict, output_mode: str = "replace"
) -> DataFrame:
    """Apply value→index maps as chained literal conditions (broadcast-free
    for bounded cardinality; unseen values → -1 like handleInvalid=keep)."""
    exprs = {}
    for c, mapping in model.items():
        e = None
        for v, i in mapping.items():
            cond = F.col(c) == F.lit(v)
            e = F.when(cond, F.lit(i)) if e is None else e.when(cond, F.lit(i))
        if e is None:
            exprs[c] = F.lit(None).cast("int")
        else:
            exprs[c] = (
                F.when(F.col(c).isNull(), F.lit(None).cast("int"))
                .otherwise(e.otherwise(F.lit(-1)))
                .cast("int")
            )
    return _out(idf, exprs, output_mode, "_index")


def one_hot_encoding(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    cardinality_threshold: int = 50,
) -> DataFrame:
    """Dummy-expand categorical columns to 0/1 columns ``{col}_{value}``
    (reference: transformers.py:700-728 — their OneHotEncoder + RDD
    DenseVector expansion is replaced by direct (col==v)::int expressions,
    one distinct-collect per fit, zero shuffles at apply)."""
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="categorical")
    model = label_encoding_fit(idf, cols, index_order="alphabetAsc",
                               cardinality_threshold=cardinality_threshold)
    out_cols = [F.col(c) for c in idf.columns]
    for c in cols:
        if c not in model:
            continue
        for v in sorted(model[c]):
            safe = "".join(ch if ch.isalnum() else "_" for ch in str(v))
            out_cols.append((F.col(c) == F.lit(v)).cast("int").alias(f"{c}_{safe}"))
    return idf.select(*out_cols)


def target_encoding_fit(
    idf: DataFrame, list_of_cols, label_col: str, event_label=1
) -> dict:
    """Per-category event-rate map (reference: transformers.py:776-962).
    One groupBy per column batched via melt."""
    from anovos_spark.core.utils import melt

    cols = resolve_columns(idf, list_of_cols, restrict_to="categorical")
    lbl = (F.col(label_col) == F.lit(event_label)).cast("double")
    long_df = melt(
        idf.select(cols + [label_col]).withColumn("__y__", lbl),
        ["__y__"],
        cols,
        "attribute",
        "value",
    )
    rates = (
        long_df.where(F.col("value").isNotNull())
        .groupBy("attribute", "value")
        .agg(F.round(F.avg("__y__"), 6).alias("rate"))
    )
    model: dict[str, dict] = {}
    for r in rates.collect():
        model.setdefault(r["attribute"], {})[r["value"]] = r["rate"]
    return model


def target_encoding_apply(
    idf: DataFrame, model: dict, output_mode: str = "replace"
) -> DataFrame:
    exprs = {}
    for c, mapping in model.items():
        e = None
        for v, rate in mapping.items():
            cond = F.col(c) == F.lit(v)
            e = F.when(cond, F.lit(rate)) if e is None else e.when(cond, F.lit(rate))
        exprs[c] = e.otherwise(F.lit(None).cast("double")) if e is not None else F.lit(None).cast("double")
    return _out(idf, exprs, output_mode, "_encoded")


# --------------------------------------------------------------------------- #
# scalers
# --------------------------------------------------------------------------- #
def z_standardization(
    idf: DataFrame, list_of_cols="all", drop_cols=(), output_mode: str = "replace"
) -> tuple[DataFrame, dict]:
    """(x−µ)/σ per column; σ=0 columns excluded
    (reference: transformers.py:965-1099; their per-column select loop is one
    agg for all columns)."""
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    aggs = []
    for c in cols:
        aggs += [F.mean(c).alias(f"{c}__mu"), F.stddev(c).alias(f"{c}__sd")]
    row = idf.agg(*aggs).collect()[0]
    model = {
        c: {"mean": row[f"{c}__mu"], "stddev": row[f"{c}__sd"]}
        for c in cols
        if row[f"{c}__sd"] is not None and row[f"{c}__sd"] > 0
    }
    exprs = {
        c: (F.col(c) - F.lit(m["mean"])) / F.lit(m["stddev"]) for c, m in model.items()
    }
    return _out(idf, exprs, output_mode, "_scaled"), model


def iqr_standardization(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    output_mode: str = "replace",
    exact: bool = True,
) -> tuple[DataFrame, dict]:
    """(x−q50)/(q75−q25); zero-IQR columns excluded
    (reference: transformers.py:1102-1230)."""
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    fn = "percentile" if exact else "percentile_approx"
    acc = "" if exact else ", 100"
    aggs = [
        F.expr(f"{fn}(`{c}`, array(0.25, 0.5, 0.75){acc})").alias(f"{c}__q") for c in cols
    ]
    # fan the percentile fit out (see attribute_binning_fit: interpreted
    # agg, ~single-task scan at bench SFs, order-independent values)
    row = fan_out(idf.select(*cols)).agg(*aggs).collect()[0]
    model = {}
    for c in cols:
        q = row[f"{c}__q"]
        if q and q[2] - q[0] > 0:
            model[c] = {"q1": q[0], "median": q[1], "q3": q[2]}
    exprs = {
        c: (F.col(c) - F.lit(m["median"])) / F.lit(m["q3"] - m["q1"])
        for c, m in model.items()
    }
    return _out(idf, exprs, output_mode, "_scaled"), model


def normalization(
    idf: DataFrame, list_of_cols="all", drop_cols=(), output_mode: str = "replace"
) -> tuple[DataFrame, dict]:
    """Min-max scale to [0,1]; constant columns excluded
    (reference: transformers.py:1233-1366 — their VectorAssembler +
    MinMaxScaler + UDF + row-id join pipeline is replaced by per-column
    (x−min)/(max−min) expressions: no assemble, no join, no shuffle)."""
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    row = idf.agg(*aggs).collect()[0]
    model = {
        c: {"min": row[f"{c}__min"], "max": row[f"{c}__max"]}
        for c in cols
        if row[f"{c}__min"] is not None and row[f"{c}__max"] > row[f"{c}__min"]
    }
    exprs = {
        c: (F.col(c) - F.lit(m["min"])) / F.lit(m["max"] - m["min"])
        for c, m in model.items()
    }
    return _out(idf, exprs, output_mode, "_scaled"), model


# --------------------------------------------------------------------------- #
# imputation (MMM: mean / median / mode)
# --------------------------------------------------------------------------- #
def _exact_medians(idf: DataFrame, cols: list[str]) -> dict[str, float]:
    """Exact interpolated median per column — value-identical to Spark's
    ``percentile(c, 0.5)`` but fully parallel.

    ``percentile`` is a TypedImperativeAggregate: every task builds a
    value→count map per column and ONE final reduce merges and sorts all
    of them — the merge is single-threaded and sized by the total distinct
    count, so it dominates no matter how the scan is partitioned.  This
    shape instead melts to (attribute, value), pre-aggregates counts with
    a combinable groupBy (map-side partials), takes one per-attribute
    window cumsum, and interpolates DRIVER-side with the same formula
    Percentile.getPercentile uses — ``(hi−pos)·v_lo + (pos−lo)·v_hi`` with
    pos = 0.5·(n−1) — so results are bit-identical (floor/ceil on the same
    double, same IEEE ops; columns are cast to double up front, exactly
    like percentile's own interpolation domain for integral inputs).
    Nulls are excluded from n, matching percentile's null handling."""
    from anovos_spark.core.utils import melt

    src = idf.select(*[F.col(c).cast("double").alias(c) for c in cols])
    long_df = melt(src, [], cols, "attribute", "value").where(
        F.col("value").isNotNull()
    )
    counts = long_df.groupBy("attribute", "value").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    w = Window.partitionBy("attribute").orderBy("value")
    wa = Window.partitionBy("attribute")
    cum = counts.withColumn("__end__", F.sum("__c__").over(w)).withColumn(
        "__n__", F.sum("__c__").over(wa)
    )
    pos = (F.col("__n__") - 1).cast("double") * F.lit(0.5)
    lo = F.floor(pos)
    hi = F.ceil(pos)
    start = F.col("__end__") - F.col("__c__")
    rows = (
        cum.groupBy("attribute")
        .agg(
            F.max(
                F.when((start <= lo) & (lo < F.col("__end__")), F.col("value"))
            ).alias("vlo"),
            F.max(
                F.when((start <= hi) & (hi < F.col("__end__")), F.col("value"))
            ).alias("vhi"),
            F.max(pos).alias("pos"),
        )
        .collect()
    )
    out: dict[str, float] = {}
    for r in rows:
        p, vlo, vhi = r["pos"], r["vlo"], r["vhi"]
        lo_i, hi_i = math.floor(p), math.ceil(p)
        if lo_i == hi_i:
            out[r["attribute"]] = vlo
        else:
            out[r["attribute"]] = (hi_i - p) * vlo + (p - lo_i) * vhi
    return out


def imputation_mmm_fit(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    method_type: str = "median",
    exact: bool = True,
) -> dict:
    """Fit imputation values: mean|median for numeric, mode for categorical
    (reference: transformers.py:1369-1674; ml.feature.Imputer + per-col mode
    jobs replaced by one agg + one batched mode pass)."""
    from anovos_spark.operators.stats import mode_computation

    num_cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    cat_cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="categorical")
    model: dict[str, dict] = {}
    if num_cols:
        if method_type == "median" and exact:
            # the melt/window shape is value-identical to percentile(c, 0.5)
            # and avoids its single-threaded final map merge (see helper)
            for c, v in _exact_medians(idf, num_cols).items():
                if v is not None:
                    model[c] = {"kind": "numerical", "value": v}
        else:
            if method_type == "mean":
                aggs = [F.mean(c).alias(f"{c}__v") for c in num_cols]
            elif method_type == "median":
                aggs = [
                    F.expr(f"percentile_approx(`{c}`, 0.5, 100)").alias(f"{c}__v")
                    for c in num_cols
                ]
            else:
                raise ValueError("method_type must be mean|median")
            row = idf.agg(*aggs).collect()[0]
            for c in num_cols:
                if row[f"{c}__v"] is not None:
                    model[c] = {"kind": "numerical", "value": row[f"{c}__v"]}
    if cat_cols:
        for r in mode_computation(idf, cat_cols).collect():
            model[r["attribute"]] = {"kind": "categorical", "value": r["mode"]}
    return model


def imputation_mmm_apply(
    idf: DataFrame, model: dict, output_mode: str = "replace"
) -> DataFrame:
    exprs = {
        c: F.when(F.col(c).isNull(), F.lit(m["value"])).otherwise(F.col(c))
        for c, m in model.items()
    }
    return _out(idf, exprs, output_mode, "_imputed")


def imputation_MMM(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    method_type: str = "median",
    output_mode: str = "replace",
    exact: bool = True,
) -> tuple[DataFrame, dict]:
    model = imputation_mmm_fit(idf, list_of_cols, drop_cols, method_type, exact)
    return imputation_mmm_apply(idf, model, output_mode), model


# --------------------------------------------------------------------------- #
# outlier categories
# --------------------------------------------------------------------------- #
def outlier_categories_fit(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    coverage: float = 1.0,
    max_category: int = 50,
) -> dict:
    """Keep top categories by cumulative coverage then cap at max_category
    (reference: transformers.py:3489-3671, rank/cumsum windows :3594-3614).

    Batched melt → one groupBy for all columns.  Deterministic order:
    frequency desc, value asc.  Model: {col: [kept values]}.
    """
    from anovos_spark.core.utils import melt

    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="categorical")
    long_df = melt(idf.select(cols), [], cols, "attribute", "value")
    counts = (
        long_df.where(F.col("value").isNotNull())
        .groupBy("attribute", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("attribute").orderBy(F.col("cnt").desc(), F.col("value").asc())
    total_w = Window.partitionBy("attribute")
    ranked = (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum_pct",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0))
            / F.sum("cnt").over(total_w),
        )
        # keep a category if the coverage target was NOT already reached
        # before it (reference keeps the bin that crosses the threshold)
        .withColumn("prev_cum", F.lag("cum_pct", 1, 0.0).over(w))
        .where((F.col("prev_cum") < F.lit(coverage)) & (F.col("rn") <= F.lit(max_category)))
    )
    model: dict[str, list] = {}
    for r in ranked.select("attribute", "value").collect():
        model.setdefault(r["attribute"], []).append(r["value"])
    return model


def outlier_categories_apply(
    idf: DataFrame,
    model: dict,
    replacement: str = "outlier_categories",
    output_mode: str = "replace",
) -> DataFrame:
    exprs = {}
    for c, kept in model.items():
        exprs[c] = (
            F.when(F.col(c).isNull(), F.lit(None).cast("string"))
            .when(F.col(c).isin(kept), F.col(c))
            .otherwise(F.lit(replacement))
        )
    return _out(idf, exprs, output_mode, "_outliered")


# --------------------------------------------------------------------------- #
# math feature transformation
# --------------------------------------------------------------------------- #
_MATH_OPS = {
    "ln": lambda x, n: F.log(x),
    "log10": lambda x, n: F.log10(x),
    "log2": lambda x, n: F.log2(x),
    "exp": lambda x, n: F.exp(x),
    "powOf2": lambda x, n: F.pow(F.lit(2.0), x),
    "powOf10": lambda x, n: F.pow(F.lit(10.0), x),
    "powOfN": lambda x, n: F.pow(F.lit(float(n)), x),
    "sqrt": lambda x, n: F.sqrt(x),
    "cbrt": lambda x, n: F.cbrt(x),
    "sq": lambda x, n: F.pow(x, F.lit(2.0)),
    "cb": lambda x, n: F.pow(x, F.lit(3.0)),
    "toPowerN": lambda x, n: F.pow(x, F.lit(float(n))),
    "sin": lambda x, n: F.sin(x),
    "cos": lambda x, n: F.cos(x),
    "tan": lambda x, n: F.tan(x),
    "asin": lambda x, n: F.asin(x),
    "acos": lambda x, n: F.acos(x),
    "atan": lambda x, n: F.atan(x),
    "radians": lambda x, n: F.radians(x),
    "remainderDivByN": lambda x, n: x % F.lit(float(n)),
    "factorial": lambda x, n: F.factorial(x.cast("int")).cast("double"),
    "mulInverse": lambda x, n: F.lit(1.0) / x,
    "floor": lambda x, n: F.floor(x).cast("double"),
    "ceil": lambda x, n: F.ceil(x).cast("double"),
    "roundN": lambda x, n: F.round(x, int(n)),
}


def feature_transformation(
    idf: DataFrame,
    list_of_cols="all",
    drop_cols=(),
    method_type: str = "sqrt",
    N: float = 2,
    output_mode: str = "replace",
) -> DataFrame:
    """25 scalar math transforms — direct Catalyst functions
    (reference: transformers.py:3171-3324 map table :3275-3301)."""
    if method_type not in _MATH_OPS:
        raise ValueError(f"method_type must be one of {sorted(_MATH_OPS)}")
    cols = resolve_columns(idf, list_of_cols, drop_cols, restrict_to="numerical")
    fn = _MATH_OPS[method_type]
    exprs = {c: fn(F.col(c).cast("double"), N) for c in cols}
    return _out(idf, exprs, output_mode, f"_{method_type}")


def expression_parser(
    idf: DataFrame, list_of_expr, postfix: str = ""
) -> DataFrame:
    """SQL scalar expressions → appended feature columns
    (reference: transformers.py:3674-3772, F.expr per expression :3762)."""
    from anovos_spark.core.utils import ensure_list

    exprs = ensure_list(list_of_expr)
    out = [F.col(c) for c in idf.columns]
    for i, ex in enumerate(exprs):
        alias = None
        low = ex.lower()
        if " as " in low:
            idx = low.rindex(" as ")
            alias = ex[idx + 4 :].strip().strip("`")
            ex = ex[:idx]
        out.append(F.expr(ex).alias(alias or f"f{i}{postfix}"))
    return idf.select(*out)


def feature_hashing(
    idf: DataFrame,
    list_of_cols,
    n_features: int = 1024,
    output_mode: str = "append",
    suffix: str = "_hashed",
) -> DataFrame:
    """Hashing-trick categorical encoding: value → stable bucket index in
    [0, n_features) via the first 8 hex digits of md5(col || '|' || value)
    mod n_features.  The 100 TB-native alternative to label/one-hot
    encoding: ZERO driver state (no distinct collection, no vocabulary,
    no fit), a pure projection that is identical on any cluster size or
    engine — the column name is salted in so the same value in different
    columns gets independent buckets, as in scikit/Vowpal feature
    hashing.  Collisions are the accepted trade (p ≈ n_distinct²/2n) and
    why n_features should be ~10× expected cardinality.

    No reference analogue (its cat_to_num paths all collect a mapping —
    transformers.py:808-1065); this exists for the cardinalities where
    that collection itself is the scale problem.
    """
    from anovos_spark.core.utils import ensure_list

    cols = ensure_list(list_of_cols)
    if output_mode not in ("append", "replace"):
        raise ValueError("output_mode must be append|replace")

    def bucket(c: str):
        key = F.concat_ws("|", F.lit(c), F.col(c).cast("string"))
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        return F.when(
            F.col(c).isNull(), F.lit(None).cast("int")
        ).otherwise((h % n_features).cast("int"))

    if output_mode == "replace":
        return idf.select(
            *[bucket(c).alias(c) if c in cols else F.col(c) for c in idf.columns]
        )
    return idf.select(
        *idf.columns, *[bucket(c).alias(f"{c}{suffix}") for c in cols]
    )
