"""Batched grouped-map execution: ``applyInPandas`` semantics at
``mapInPandas`` cost.

``DataFrame.groupBy(keys).applyInPandas(fn)`` pays one Arrow
round-trip + Python UDF dispatch PER GROUP.  For curve-style
workloads — millions of small groups, trivial per-group math — that
dispatch dominates the stage (the same cost class the round-9
streaming work measured at ~0.6 ms/key/invocation and fixed by bucket
keying).  :func:`map_grouped_in_pandas` runs the identical per-group
function over key-sorted partitions via ``mapInPandas``: one Python
invocation per ARROW BATCH (thousands of rows, hundreds of groups),
with a carry buffer for the group that spans a batch boundary.

Output-identical to the applyInPandas form by construction: rows are
hash-repartitioned on the group keys (all rows of a group in one
partition) and sorted by (keys, *order_cols) within partitions, so
each group arrives contiguous and in a deterministic row order —
stronger than applyInPandas, whose within-group row order follows
partition arrival (the in-repo per-group fns re-sort internally, so
both forms feed the group fn identical frames).

Memory: per-task state is one Arrow batch plus the trailing group —
NOT the per-task hash-agg state that made wide curve builds cliff at
~60 k groups/task (specific_curves._CURVE_SET_GROUPS_PER_TASK
history); the explicit partition count is still taken for
parallelism, not for memory survival.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def _norm_name(name) -> tuple:
    return name if isinstance(name, tuple) else (name,)


def _same_key(a: tuple | None, b: tuple | None) -> bool:
    if a is None or b is None:
        return False
    return all(
        (x == y) or (pd.isna(x) and pd.isna(y)) for x, y in zip(a, b)
    )


def _make_runner(
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    key_list = list(keys)

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Carry for the group spanning a batch boundary, kept as a LIST
        # of raw frames and concatenated exactly once at the group's
        # end: re-concat + re-groupby of a growing buffer per batch
        # would be O(B²) copying for a single group spanning B batches
        # (a dominant route or curve-set key), where plain applyInPandas
        # is one pass.
        carry: list[pd.DataFrame] = []
        carry_key: tuple | None = None

        def _flush() -> pd.DataFrame | None:
            nonlocal carry, carry_key
            if not carry:
                return None
            g = (
                carry[0]
                if len(carry) == 1
                else pd.concat(carry, ignore_index=True)
            )
            carry, carry_key = [], None
            return fn(g.reset_index(drop=True))

        for pdf in batches:
            if pdf.empty:
                continue
            # sort=False → groups in order of appearance; the input is
            # key-sorted, so groups are contiguous and the LAST group
            # may continue in the next batch — hold it back
            # list(iter(...)) not list(...): pandas 2.2's GroupBy.__len__
            # raises "Categorical categories cannot be null" on NaN keys
            # with dropna=False; iterating sidesteps the len() prealloc
            groups = list(iter(pdf.groupby(key_list, sort=False, dropna=False)))
            first_key = _norm_name(groups[0][0])
            if carry and not _same_key(carry_key, first_key):
                out = _flush()
                if out is not None and len(out):
                    yield out
            if len(groups) == 1:
                # whole batch is one group: append raw, defer the concat
                carry.append(groups[0][1])
                carry_key = first_key
                continue
            start = 0
            if carry:
                # ≥2 groups in this batch → the continued group ends here
                carry.append(groups[0][1])
                out = _flush()
                if out is not None and len(out):
                    yield out
                start = 1
            for _, gpdf in groups[start:-1]:
                out = fn(gpdf.reset_index(drop=True))
                if len(out):
                    yield out
            carry = [groups[-1][1]]
            carry_key = _norm_name(groups[-1][0])
        out = _flush()
        if out is not None and len(out):
            yield out

    return _runner


def map_grouped_in_pandas(
    df: DataFrame,
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    num_partitions: int | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Run ``fn`` once per distinct ``keys`` group of ``df`` (the
    applyInPandas contract) at one Python invocation per Arrow batch.

    ``num_partitions`` sizes the explicit hash repartition on the group
    keys (defaults to the session shuffle-partition setting via plain
    ``repartition(*keys)``); ``order_cols`` extends the within-
    partition sort so the group fn sees rows in a deterministic order
    even when it does not re-sort internally."""
    parts = (
        df.repartition(num_partitions, *keys)
        if num_partitions is not None
        else df.repartition(*keys)
    )
    return parts.sortWithinPartitions(*keys, *order_cols).mapInPandas(
        _make_runner(keys, fn), schema
    )
