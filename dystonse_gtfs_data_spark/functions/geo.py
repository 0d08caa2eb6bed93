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


# Latitudes within this of a pole get the brute-force cap path: at
# 89.99° a longitude degree is ~19 m, so cell-index arithmetic stops
# being a useful prune there (and every real transit stop is far away).
_POLAR_LAT_DEG = 89.99


def grid_cell_sizes_deg(radius_m: float, max_abs_lat_deg: float = 60.0) -> tuple[float, float]:
    """(Δlat°, Δlon°) for square-ish grid cells at least ``radius_m`` on a
    side anywhere up to ``max_abs_lat_deg`` latitude.  Longitude cells are
    sized for the *worst-case* latitude so the 3×3 neighborhood always
    covers the radius — oversized cells only add candidates, never drop
    pairs (the exact haversine filter afterwards restores precision)."""
    dlat = radius_m / _MIN_M_PER_DEG_LAT
    lat = min(_POLAR_LAT_DEG, abs(max_abs_lat_deg))
    dlon = radius_m / (_M_PER_DEG_LON_EQUATOR * math.cos(math.radians(lat)))
    return dlat, min(dlon, 360.0)


def grid_proximity_pairs(
    points: DataFrame,
    id_cols: list[str],
    lat_col: str,
    lon_col: str,
    radius_m: float,
    max_abs_lat_deg: float | None = None,
) -> DataFrame:
    """J8 at scale: all point pairs within ``radius_m`` via a grid-cell
    EQUI-join instead of an O(n²) cross join — exact at ANY latitude.

    Each point gets an integer cell id; one side keeps its exact cell,
    the other explodes to its 3×3 neighbor cells; the join on
    (cell_lat, cell_lon) is a plain shuffle equi-join (hash-partitioned,
    no BroadcastNestedLoop), then the exact haversine ``<= radius_m``
    filter drops false candidates.  Both orientations (a,b) and (b,a)
    and self-pairs survive — callers apply their own pair predicate.
    Shuffle volume is 9×|points| exploded rows + |points| — linear, vs
    the |points|² candidate space of the naive join (reference
    scans all stops per stop: src/monitor/journey_data.rs:241-263).

    Exactness guarantees (matching the reference's all-pairs scan):

    - **Longitude cells are sized from the data**: by default one cheap
      column-pruned ``max(abs(lat))`` agg picks the worst-case latitude,
      so a Helsinki/Tromsø/Anchorage feed gets wider cells instead of
      silently losing near-radius pairs.  Pass ``max_abs_lat_deg`` to
      skip the agg when the bound is known (cells are then sized for
      that band — the stated contract of the override).
    - **Antimeridian wrap**: longitude cell indices are modular
      (``ncells = ceil(360/Δlon)``), so a pair straddling ±180° lands
      in adjacent cells instead of opposite ends of the index space.
    - **Polar caps**: points above ±89.99° (where a longitude degree is
      ~19 m) fall back to a tiny brute-force cross join of the cap
      subset; the grid handles everything below, disjointly.

    Output: ``<id>_a``…, lat_a, lon_a, ``<id>_b``…, lat_b, lon_b, dist_m.
    """
    if max_abs_lat_deg is None:
        row = points.agg(F.max(F.abs(F.col(lat_col)))).first()
        lam = float(row[0]) if row is not None and row[0] is not None else 0.0
    else:
        lam = abs(max_abs_lat_deg)
    dlat, dlon = grid_cell_sizes_deg(radius_m, lam)
    ncells_lon = max(1, math.ceil(360.0 / dlon))

    base = points.select(*id_cols, lat_col, lon_col)

    def cell_lat(col: Column) -> Column:
        return F.floor(col / F.lit(dlat))

    def cell_lon(col: Column) -> Column:
        # shift to [0, 360) then wrap so ±180° are the same/adjacent cells
        return F.pmod(F.floor((col + 180.0) / F.lit(dlon)), F.lit(ncells_lon))

    a = base.select(
        *[F.col(c).alias(f"{c}_a") for c in id_cols],
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
        cell_lat(F.col(lat_col)).alias("_cell_lat"),
        cell_lon(F.col(lon_col)).alias("_cell_lon"),
    )
    neighbor_cells = F.array(
        *[
            F.struct(
                (cell_lat(F.col(lat_col)) + i).alias("cell_lat"),
                F.pmod(cell_lon(F.col(lon_col)) + j, F.lit(ncells_lon)).alias(
                    "cell_lon"
                ),
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
    pairs = (
        a.join(b, ["_cell_lat", "_cell_lon"])
        .withColumn(
            "dist_m",
            haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")),
        )
        .filter(F.col("dist_m") <= radius_m)
        .drop("_cell_lat", "_cell_lon")
    )

    if lam <= _POLAR_LAT_DEG:
        return pairs

    # Polar cap: pairs with EITHER endpoint above the threshold go through
    # an exact brute-force join of the (physically tiny) cap subset; the
    # grid result keeps only pairs with BOTH endpoints below — disjoint
    # and complete.  The cap margin (one Δlat) catches cross-boundary
    # partners.
    theta = _POLAR_LAT_DEG
    in_cap = F.abs(F.col(lat_col)) >= theta - dlat
    cap = base.filter(in_cap)
    cap_a = cap.select(
        *[F.col(c).alias(f"{c}_a") for c in id_cols],
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
    )
    cap_b = cap.select(
        *[F.col(c).alias(f"{c}_b") for c in id_cols],
        F.col(lat_col).alias("lat_b"),
        F.col(lon_col).alias("lon_b"),
    )
    either_polar = (F.abs(F.col("lat_a")) >= theta) | (F.abs(F.col("lat_b")) >= theta)
    brute = (
        cap_a.crossJoin(F.broadcast(cap_b))
        .withColumn(
            "dist_m",
            haversine_m(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")),
        )
        .filter((F.col("dist_m") <= radius_m) & either_polar)
    )
    return pairs.filter(~either_polar).unionByName(brute)
