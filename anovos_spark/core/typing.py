"""Semantic typing & column-spec resolution.

Re-implements the reference's 3-way semantic triage
(reference: shared/utils.py:48-73 ``attributeType_segregation``) and the
"all"/drop_cols argument-normalization preamble repeated in every reference
function (e.g. stats_generator.py:295-307) — here centralized once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Spark dtypes considered numerical (reference: shared/utils.py:56-60).
_NUMERIC_PREFIXES = ("decimal",)
_NUMERIC_TYPES = {"double", "int", "bigint", "float", "long", "smallint", "tinyint"}
# Discrete subset used for mode / IDness / invalid-entry checks
# (reference: quality_checker.py:1124-1126).
_DISCRETE_TYPES = {"string", "int", "bigint", "long", "smallint", "tinyint"}


def attribute_type_segregation(df: DataFrame) -> tuple[list[str], list[str], list[str]]:
    """Split columns into (numerical, categorical, other) by Spark dtype.

    categorical = string; numerical = numeric types incl. decimal(*);
    other = date/timestamp/array/map/struct/boolean/binary (excluded from
    generic analysis; handled by the datetime / multimodal modules).
    """
    num_cols, cat_cols, other_cols = [], [], []
    for name, dtype in df.dtypes:
        if dtype in _NUMERIC_TYPES or dtype.startswith(_NUMERIC_PREFIXES):
            num_cols.append(name)
        elif dtype == "string":
            cat_cols.append(name)
        else:
            other_cols.append(name)
    return num_cols, cat_cols, other_cols


def numerical_columns(df: DataFrame) -> list[str]:
    return attribute_type_segregation(df)[0]


def categorical_columns(df: DataFrame) -> list[str]:
    return attribute_type_segregation(df)[1]


def discrete_columns(df: DataFrame) -> list[str]:
    """Columns eligible for mode/IDness/invalid-entry checks."""
    return [name for name, dtype in df.dtypes if dtype in _DISCRETE_TYPES]


def resolve_columns(
    df: DataFrame,
    list_of_cols: str | list[str] = "all",
    drop_cols: str | list[str] = (),
    restrict_to: str | None = None,
) -> list[str]:
    """Normalize a column spec: 'all' | 'col1|col2' | list → concrete list.

    ``restrict_to`` ∈ {None, 'numerical', 'categorical', 'discrete'} filters
    the 'all' universe by semantic type.  Raises on unknown columns.
    """
    if restrict_to == "numerical":
        universe = numerical_columns(df)
    elif restrict_to == "categorical":
        universe = categorical_columns(df)
    elif restrict_to == "discrete":
        universe = discrete_columns(df)
    else:
        universe = list(df.columns)

    if isinstance(list_of_cols, str):
        cols = universe if list_of_cols == "all" else [c.strip() for c in list_of_cols.split("|") if c.strip()]
    else:
        cols = list(list_of_cols)

    if isinstance(drop_cols, str):
        drops = {c.strip() for c in drop_cols.split("|") if c.strip()}
    else:
        drops = set(drop_cols)

    cols = [c for c in cols if c not in drops]
    unknown = [c for c in cols if c not in df.columns]
    if unknown:
        raise ValueError(f"columns not in DataFrame: {unknown}")
    if restrict_to is not None:
        allowed = set(universe)
        cols = [c for c in cols if c in allowed]
    # de-dupe preserving order
    seen: set[str] = set()
    out = []
    for c in cols:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out
