"""Plan-audit helpers: programmatic access to the physical plan so the
scale properties we design for — predicate pushdown, column pruning,
broadcast joins, bounded shuffles, whole-stage codegen — are *asserted*
in tests rather than eyeballed.  This is the per-operator `.explain`
discipline the build contract asks for, made executable.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning check)."""
    plan = formatted_plan(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def broadcast_join_count(df: DataFrame) -> int:
    # count the numbered operator headers so tree + detail sections of the
    # formatted plan aren't double-counted
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def wholestage_codegen_spans(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
