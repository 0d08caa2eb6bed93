"""RouteSection: Beginning/Middle/End of a trip by stop index
(src/types/route_sections.rs:37-52): section_size = min(5, stop_count/3);
index < size → beginning; stop_count − index <= size → end; else middle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def route_section(stop_index: Column, stop_count: Column) -> Column:
    size = F.least(F.lit(5), (stop_count / 3).cast("int"))
    return (
        F.when(stop_index < size, F.lit("beginning"))
        .when(stop_count - stop_index <= size, F.lit("end"))
        .otherwise(F.lit("middle"))
    )


def route_section_sql(stop_index: str, stop_count: str) -> str:
    size = f"least(5, CAST(floor({stop_count} / 3) AS INT))"
    return (
        f"(CASE WHEN {stop_index} < {size} THEN 'beginning' "
        f"WHEN {stop_count} - {stop_index} <= {size} THEN 'end' "
        f"ELSE 'middle' END)"
    )
