"""Session-lifetime cache bookkeeping.

A handful of operators persist a small intermediate whose LINEAGE is
expensive (windowed ECDF knots) or whose plan must be severed from the
consumer's codegen (the BPE fold under a Generate).  Those frames are
returned to the caller lazily, so the operator itself can never
unpersist — and in a long-lived driver (bench loop, notebook, the
round driver's catalog sweep) the cached blocks would otherwise
accumulate without bound.

``tracked_persist`` registers every such frame; harnesses call
``release_persisted()`` between queries to drop them once the consuming
action finished.  Unpersisting is always safe — the worst case is a
recompute if the frame is re-consumed later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.persist()`` that a later :func:`release_persisted` can undo."""
    df = df.persist()
    if eager:
        df.count()
    _LIVE.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    return n
