"""Cheap construction of array literals.

``F.lit(list)`` lowers to ``array(lit(e), lit(e), …)`` — one py4j round
trip PER SCALAR (pyspark/sql/functions/builtin.py).  Under this
project's measured py4j latency that is ~60 ms per 64-element double
array and whole SECONDS for a k×dim matrix, all driver-side, all
before a single task runs.  Parsing the same array as ONE SQL string
via ``F.expr`` is one round trip and ~50× faster (measured 0.246 s vs
12.45 s for 200 64-double arrays), and the parsed tree is the SAME
``CreateArray(Literal…)`` the per-element lowering builds — same
element types, same ``containsNull=False``, so analyzed and executed
plans are byte-identical (verified, including −0.0/1e−300/2^−52 edge
doubles: Python ``repr`` emits shortest-round-trip decimals and Java's
``parseDouble`` reconstructs the identical IEEE bits).

Non-finite doubles have no SQL literal form — those fall back to the
per-element path (none of the project's codebooks/planes/centroid
tables can produce them, but correctness beats speed if one appears).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_I32_MIN = -(1 << 31)
_I32_MAX = (1 << 31) - 1


def _dbl_sql(v: float) -> str | None:
    f = float(v)
    if not math.isfinite(f):
        return None
    return repr(f) + "D"


def _int_sql(v: int) -> str:
    i = int(v)
    # parity with F.lit's typing: a Python int in int32 range lowers to
    # IntegerType, else LongType.  The SQL parser agrees except for the
    # exact int32 minimum (parsed as UnaryMinus(bigint)); the CAST folds
    # to the identical IntegerType literal.
    if i == _I32_MIN:
        return f"CAST({i} AS INT)"
    if _I32_MIN <= i <= _I32_MAX:
        return str(i)
    return f"{i}L"


def lit_doubles(vals: Sequence[float]) -> Column:
    """``array<double>`` literal in one ``F.expr`` parse."""
    parts = [_dbl_sql(v) for v in vals]
    if len(parts) == 0 or any(p is None for p in parts):
        return F.lit([float(v) for v in vals])
    return F.expr("array(" + ",".join(parts) + ")")


def lit_double_matrix(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal in one ``F.expr`` parse."""
    body = []
    for row in rows:
        parts = [_dbl_sql(v) for v in row]
        if len(parts) == 0 or any(p is None for p in parts):
            return F.lit([[float(v) for v in row] for row in rows])
        body.append("array(" + ",".join(parts) + ")")
    if len(body) == 0:
        return F.lit([[float(v) for v in row] for row in rows])
    return F.expr("array(" + ",".join(body) + ")")


def lit_ints(vals: Sequence[int]) -> Column:
    """``array<int|bigint>`` literal in one ``F.expr`` parse (element
    typing matches ``F.lit``'s per-element rule)."""
    if len(vals) == 0:
        return F.lit([int(v) for v in vals])
    return F.expr("array(" + ",".join(_int_sql(v) for v in vals) + ")")


def lit_int_matrix(rows: Sequence[Sequence[int]]) -> Column:
    """``array<array<int|bigint>>`` literal in one ``F.expr`` parse."""
    if len(rows) == 0 or any(len(row) == 0 for row in rows):
        return F.lit([[int(v) for v in row] for row in rows])
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_int_sql(v) for v in row) + ")"
            for row in rows
        )
        + ")"
    )
