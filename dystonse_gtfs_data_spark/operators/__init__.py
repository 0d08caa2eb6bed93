from . import (
    asof,
    count,
    dedup,
    default_curves,
    gapfill,
    monitor,
    predict,
    records,
    similarity,
    specific_curves,
)

__all__ = [
    "asof",
    "count",
    "dedup",
    "default_curves",
    "gapfill",
    "monitor",
    "predict",
    "records",
    "similarity",
    "specific_curves",
]
