from .inspect import (
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "count_shuffles",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "read_schema_columns",
]
