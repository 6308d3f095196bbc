from .explain import (
    broadcast_join_count,
    exchange_count,
    has_operator,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "has_operator",
    "physical_plan",
    "pushed_filters",
    "read_schema_columns",
]
