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

``tracked_tmpdir`` is the disk analog: a few operators back their
RETURNED frame with scratch parquet (the ranked-ExactSubstr level
tables, the streaming-dedup sink) that must outlive the call but not
the harness's query loop.  ``release_persisted()`` reclaims those
directories too; process exit is only the backstop.  Unlike a released
persist, a released tmpdir does NOT recompute — re-consuming the frame
afterwards raises — so harnesses must release only after the consuming
action, which every in-repo call site already does.
"""

from __future__ import annotations

import atexit
import shutil

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_TMPDIRS: list[str] = []


def tracked_tmpdir(path: str) -> str:
    """Register a scratch dir backing a lazily-returned frame.

    Removed by the next :func:`release_persisted` (callers invoke it
    after the consuming action) or, failing that, at process exit —
    one registry, one atexit hook, no per-call registration pile-up.
    """
    _TMPDIRS.append(path)
    return path


def _purge_tmpdirs() -> int:
    n = 0
    while _TMPDIRS:
        shutil.rmtree(_TMPDIRS.pop(), ignore_errors=True)
        n += 1
    return n


atexit.register(_purge_tmpdirs)


def tracked_persist(df: DataFrame, eager: bool = False) -> DataFrame:
    """``df.persist()`` that a later :func:`release_persisted` can undo."""
    df = df.persist()
    if eager:
        df.count()
    _LIVE.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked frame and reclaim tracked scratch dirs.

    Returns the number of frames unpersisted (tmpdirs are counted
    separately by :func:`_purge_tmpdirs`'s return, discarded here).
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to free
    _purge_tmpdirs()
    return n
