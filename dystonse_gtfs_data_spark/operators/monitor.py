"""Departure-board / monitor query layer (src/monitor/mod.rs): the
serving-side DataFrame queries over the predictions table.

- departure_board: predictions at a stop set within a time window,
  realtime-over-schedule dedup, outlier/last-stop filters, sorted by
  median predicted time (F5/F6/W2/F9/W5 + J7).
- extended_stops: the 300 m haversine proximity set (J8).
- autocomplete_stops: top-10 name search (O4/C7).
- pair_counts: the record-pair count matrix (J5/A10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..curves.udfs import curve_x_at_y
from ..functions.geo import EXTENDED_STOPS_MAX_DISTANCE_M, grid_proximity_pairs
from ..schemas import ORIGIN_REALTIME
from ..sources.tables import maybe_broadcast


def extended_stops(stops: DataFrame, radius_m: float = EXTENDED_STOPS_MAX_DISTANCE_M) -> DataFrame:
    """All ordered stop pairs within ``radius_m`` (haversine), including
    self-pairs — the reference's "extended stops" cluster
    (src/monitor/journey_data.rs:22-23, 241-263).  Grid-cell equi-join:
    linear shuffle volume instead of the O(n²) all-pairs scan."""
    return grid_proximity_pairs(
        stops, ["stop_id"], "stop_lat", "stop_lon", radius_m
    ).select("stop_id_a", "stop_id_b", "dist_m")


def autocomplete_stops(stops: DataFrame, terms: list[str], limit: int = 10) -> DataFrame:
    """O4: distinct stop names containing every term (lowercased),
    sorted, top-N (src/monitor/mod.rs:198-223)."""
    cond = F.lit(True)
    for t in terms:
        cond = cond & F.lower(F.col("stop_name")).contains(t.lower())
    return (
        stops.filter(cond).select("stop_name").distinct().orderBy("stop_name").limit(limit)
    )


def pair_counts(records: DataFrame) -> DataFrame:
    """J5/A10: per (start_seq, end_seq) count of same-vehicle record pairs
    (src/monitor/mod.rs:1510-1528)."""
    key = ["source", "route_id", "trip_id", "trip_start_date", "trip_start_time"]
    a = records.select(*key, F.col("stop_sequence").alias("start_seq"))
    b = records.select(*key, F.col("stop_sequence").alias("end_seq"))
    return (
        a.join(b, key)
        .filter(F.col("start_seq") < F.col("end_seq"))
        .groupBy("start_seq", "end_seq")
        .agg(F.count("*").alias("n_pairs"))
    )


def resolve_trip(
    trips: DataFrame,
    routes: DataFrame,
    stop_times: DataFrame,
    stops: DataFrame,
    headsign: str,
    route_short_name: str,
    route_type: int,
    stop_name: str,
    departure_seconds: int,
) -> DataFrame:
    """J9: resolve a trip from journey-URL components — (headsign, route
    short name, route type, stop name within the extended set, exact
    scheduled departure).  The reference scans all trips linearly
    (src/monitor/journey_data.rs:382-473); here it is a multi-key
    equi-join over broadcast dims, returning candidate (trip_id,
    stop_sequence) rows."""
    candidate_stops = stops.filter(F.col("stop_name") == stop_name).select("stop_id")
    ext = (
        extended_stops(stops)
        .join(F.broadcast(candidate_stops), F.col("stop_id_a") == F.col("stop_id"))
        .select(F.col("stop_id_b").alias("stop_id"))
        .distinct()
    )
    r = routes.filter(
        (F.col("route_short_name") == route_short_name)
        & (F.col("route_type") == route_type)
    )
    t = trips.filter(F.col("trip_headsign") == headsign).join(
        F.broadcast(r.select("route_id")), "route_id"
    )
    st = stop_times.filter(F.col("departure_time") == departure_seconds)
    return (
        # t is pre-filtered by headsign+route (query-bounded) but derives
        # from schedule-sized trips: size-guard instead of forcing
        st.join(maybe_broadcast(t.select("trip_id", "route_id", "route_variant")), "trip_id")
        .join(F.broadcast(ext), "stop_id")
        .select("trip_id", "route_id", "route_variant", "stop_id", "stop_sequence")
    )


def departure_board(
    predictions: DataFrame,
    stop_ids: list[str],
    window_min,
    window_max,
    trip_max_sequences: DataFrame | None = None,
) -> DataFrame:
    """The stop-page query (src/monitor/mod.rs:426-591):

    - F5: time-window overlap (prediction_min < max AND prediction_max > min)
    - E1: stop_id ∈ extended set
    - W2: among predictions for the same vehicle, drop Schedule-origin
      rows when a Realtime-origin row exists
    - F9: drop the trip's final stop (needs ``trip_max_sequences``:
      trip_id → max_stop_sequence)
    - F6: keep rows whose 5%..95% quantile band overlaps the window
    - W5: sort by the median (50% quantile) predicted time
    """
    p = predictions.filter(
        F.col("stop_id").isin(stop_ids)
        & (F.col("prediction_min") < F.lit(window_max))
        & (F.col("prediction_max") > F.lit(window_min))
    )

    vehicle = ["route_id", "trip_id", "trip_start_date", "trip_start_time", "event_type", "stop_sequence"]
    w = Window.partitionBy(*vehicle)
    p = p.withColumn(
        "_has_rt", F.max((F.col("origin_type") == ORIGIN_REALTIME).cast("int")).over(w)
    ).filter((F.col("origin_type") == ORIGIN_REALTIME) | (F.col("_has_rt") == 0)).drop("_has_rt")

    if trip_max_sequences is not None:
        # trips-wide aggregate: size-guard the hint
        p = p.join(maybe_broadcast(trip_max_sequences), "trip_id", "left").filter(
            F.col("stop_sequence") < F.col("max_stop_sequence")
        ).drop("max_stop_sequence")

    # quantiles in seconds relative to prediction_min's timeline: the
    # stored curve is relative delay; absolute time = scheduled + quantile
    p = (
        p.withColumn("_q05", curve_x_at_y(F.col("prediction_curve"), F.lit(0.05)))
        .withColumn("_q50", curve_x_at_y(F.col("prediction_curve"), F.lit(0.5)))
        .withColumn("_q95", curve_x_at_y(F.col("prediction_curve"), F.lit(0.95)))
    )
    base = F.col("prediction_min").cast("double")
    p = p.filter(
        (base + F.col("_q05") < F.lit(window_max).cast("timestamp").cast("double"))
        & (base + F.col("_q95") > F.lit(window_min).cast("timestamp").cast("double"))
    )
    return (
        p.withColumn("median_time", F.timestamp_seconds(base + F.col("_q50")))
        .drop("_q05", "_q95")
        # total order: ties on median_time would otherwise surface in
        # whatever partition order the shuffle produced that run, so two
        # executions of the same board could interleave tied rows
        # differently (the HTTP shell vs the direct path, or a rerun vs
        # its oracle).  trip_start_date/time are required: two INSTANCES
        # of the same trip_id can share a median at the same stop.  The
        # tiebreakers match the differential oracle's ORDER BY exactly.
        .orderBy(
            "median_time", "trip_id", "stop_sequence", "event_type",
            "trip_start_date", "trip_start_time", "stop_id",
            "origin_type", "precision_type",
        )
    )
