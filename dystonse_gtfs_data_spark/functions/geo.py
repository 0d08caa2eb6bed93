"""Geo helpers: haversine distance (C9), built entirely from JVM-side trig
(no UDF).  Reference: src/monitor/journey_data.rs:61-77 — great-circle
meters, R = 6,371,000 m, used for the 300 m "extended stops" join (J8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0
EXTENDED_STOPS_MAX_DISTANCE_M = 300.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def haversine_m_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )
