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


def _make_runner(
    keys: Sequence[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    key_list = list(keys)

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if buf is not None:
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            # sort=False → groups in order of appearance; the input is
            # key-sorted, so groups are contiguous and the LAST group
            # may continue in the next batch — hold it back
            groups = list(
                pdf.groupby(key_list, sort=False, dropna=False)
            )
            for _, gpdf in groups[:-1]:
                out = fn(gpdf.reset_index(drop=True))
                if len(out):
                    yield out
            buf = groups[-1][1].reset_index(drop=True)
        if buf is not None and len(buf):
            out = fn(buf)
            if len(out):
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
