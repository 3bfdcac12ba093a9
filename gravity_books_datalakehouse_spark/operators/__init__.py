"""Operator library — SURVEY.md §2 re-expressed as DataFrame combinators.

Everything here is *library-level*: thin, composable functions that emit
declarative DataFrame plans so Catalyst keeps full optimization freedom
(pushdown, pruning, join reordering, broadcast selection). No custom
Catalyst rules are needed (SURVEY.md §4).
"""

from gravity_books_datalakehouse_spark.operators.relational import (
    project,
    rename,
    cast_columns,
    drop_null_rows,
)
from gravity_books_datalakehouse_spark.operators.joins import equi_join
from gravity_books_datalakehouse_spark.operators.aggregates import (
    group_concat_sorted,
    distinct_rows,
)
from gravity_books_datalakehouse_spark.operators.sort import top_k
from gravity_books_datalakehouse_spark.operators.surrogate_keys import (
    add_surrogate_key,
)

__all__ = [
    "project",
    "rename",
    "cast_columns",
    "drop_null_rows",
    "equi_join",
    "group_concat_sorted",
    "distinct_rows",
    "top_k",
    "add_surrogate_key",
]
