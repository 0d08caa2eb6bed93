"""Forward fill (W3/J6): carry the last non-null value forward over an
ordered partition — the reference's schedule gap-fill walks each vehicle's
stop list and copies the previous stop's delay into missing stops
(src/analyser/specific_curves.rs:157-252)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    cols: list[str],
    suffix: str = "_filled",
) -> DataFrame:
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return df
