from anovos_spark.core.typing import attribute_type_segregation, resolve_columns
from anovos_spark.core.utils import ensure_list, melt, pairwise_reduce, transpose

__all__ = [
    "attribute_type_segregation",
    "resolve_columns",
    "ensure_list",
    "melt",
    "pairwise_reduce",
    "transpose",
]
