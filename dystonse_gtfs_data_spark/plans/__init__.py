from .explain import (
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    shuffle_count,
    wholestage_codegen_spans,
)

__all__ = [
    "broadcast_join_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
    "wholestage_codegen_spans",
]
