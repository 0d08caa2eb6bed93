"""Geo helpers: haversine distance (C9) and the grid-cell proximity
join (J8), built entirely from JVM-side trig (no UDF).  Reference:
src/monitor/journey_data.rs:61-77 — great-circle meters,
R = 6,371,000 m, used for the 300 m "extended stops" join (J8,
journey_data.rs:241-263: the reference scans all stops per stop; at
scale we bucket by grid cell instead so the candidate set is local).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371000.0
EXTENDED_STOPS_MAX_DISTANCE_M = 300.0

# Meters per degree of latitude is nearly constant (WGS84: 110,574 at the
# equator to 111,694 at the poles); use the minimum so cells are never
# smaller than the radius.  Longitude degrees shrink with cos(lat).
_MIN_M_PER_DEG_LAT = 110574.0
_M_PER_DEG_LON_EQUATOR = 111320.0


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


def grid_cell_sizes_deg(radius_m: float, max_abs_lat_deg: float = 60.0) -> tuple[float, float]:
    """(Δlat°, Δlon°) for square-ish grid cells at least ``radius_m`` on a
    side anywhere up to ``max_abs_lat_deg`` latitude.  Longitude cells are
    sized for the *worst-case* latitude so the 3×3 neighborhood always
    covers the radius — oversized cells only add candidates, never drop
    pairs (the exact haversine filter afterwards restores precision)."""
    dlat = radius_m / _MIN_M_PER_DEG_LAT
    lat = min(89.0, abs(max_abs_lat_deg))
    dlon = radius_m / (_M_PER_DEG_LON_EQUATOR * math.cos(math.radians(lat)))
    return dlat, dlon


def grid_proximity_pairs(
    points: DataFrame,
    id_cols: list[str],
    lat_col: str,
    lon_col: str,
    radius_m: float,
    max_abs_lat_deg: float = 60.0,
) -> DataFrame:
    """J8 at scale: all point pairs within ``radius_m`` via a grid-cell
    EQUI-join instead of an O(n²) cross join.

    Each point gets an integer cell id; one side keeps its exact cell,
    the other explodes to its 3×3 neighbor cells; the join on
    (cell_lat, cell_lon) is a plain shuffle equi-join (hash-partitioned,
    no BroadcastNestedLoop), then the exact haversine ``<= radius_m``
    filter drops false candidates.  Both orientations (a,b) and (b,a)
    and self-pairs survive — callers apply their own pair predicate.
    Shuffle volume is 9×|points| exploded rows + |points| — linear, vs
    the |points|² candidate space of the naive join (reference
    scans all stops per stop: src/monitor/journey_data.rs:241-263).

    ``max_abs_lat_deg`` bounds the operating latitudes (default ±60°);
    cells are sized conservatively for that band, so no pair within the
    radius is ever missed below it.

    Output: ``<id>_a``…, lat_a, lon_a, ``<id>_b``…, lat_b, lon_b, dist_m.
    """
    dlat, dlon = grid_cell_sizes_deg(radius_m, max_abs_lat_deg)
    base = points.select(*id_cols, lat_col, lon_col)
    a = base.select(
        *[F.col(c).alias(f"{c}_a") for c in id_cols],
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
        F.floor(F.col(lat_col) / F.lit(dlat)).alias("_cell_lat"),
        F.floor(F.col(lon_col) / F.lit(dlon)).alias("_cell_lon"),
    )
    neighbor_cells = F.array(
        *[
            F.struct(
                (F.floor(F.col(lat_col) / F.lit(dlat)) + i).alias("cell_lat"),
                (F.floor(F.col(lon_col) / F.lit(dlon)) + j).alias("cell_lon"),
            )
            for i in (-1, 0, 1)
            for j in (-1, 0, 1)
        ]
    )
    b = (
        base.select(
            *[F.col(c).alias(f"{c}_b") for c in id_cols],
            F.col(lat_col).alias("lat_b"),
            F.col(lon_col).alias("lon_b"),
            F.explode(neighbor_cells).alias("_nb"),
        )
        .withColumn("_cell_lat", F.col("_nb.cell_lat"))
        .withColumn("_cell_lon", F.col("_nb.cell_lon"))
        .drop("_nb")
    )
    return (
        a.join(b, ["_cell_lat", "_cell_lon"])
        .withColumn(
            "dist_m",
            haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")),
        )
        .filter(F.col("dist_m") <= radius_m)
        .drop("_cell_lat", "_cell_lon")
    )
