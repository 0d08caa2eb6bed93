"""Journey/transfer math (monitor's C10-C15): walk-time curves,
CDF convolution, transfer probabilities — the per-component chain the
reference accumulates along a journey URL
(src/monitor/journey_data.rs:166-485, src/monitor/time_curve.rs).

All curve algebra runs in Arrow-batched pandas UDFs over the
array<struct<x,y>> curve column; the scalar trig/geometry stays JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..curves.core import convolve_cdfs, transfer_probability, walk_time_curve
from ..curves.udfs import CURVE_TYPE, curve_to_rows, rows_to_curve
from ..functions.geo import grid_proximity_pairs


@F.pandas_udf(CURVE_TYPE)
def walk_time_curve_udf(distance_m: pd.Series) -> pd.Series:
    """C10: distance → CDF of walk duration (src/monitor/journey_data.rs:558-594)."""
    return pd.Series(
        [None if d is None else curve_to_rows(walk_time_curve(float(d))) for d in distance_m]
    )


@F.pandas_udf(CURVE_TYPE)
def convolve_udf(arrival: pd.Series, duration: pd.Series) -> pd.Series:
    """C13: arrival CDF ⊕ duration CDF (discrete convolution,
    src/monitor/time_curve.rs:34-77)."""
    out = []
    for a_rows, d_rows in zip(arrival, duration):
        a, d = rows_to_curve(a_rows), rows_to_curve(d_rows)
        out.append(None if a is None or d is None else curve_to_rows(convolve_cdfs(a, d)))
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def transfer_probability_udf(arrival: pd.Series, departure: pd.Series) -> pd.Series:
    """C14: P(departure after arrival) via 100-percentile integration
    (src/monitor/time_curve.rs:18-32)."""
    out = []
    for a_rows, d_rows in zip(arrival, departure):
        a, d = rows_to_curve(a_rows), rows_to_curve(d_rows)
        out.append(None if a is None or d is None else transfer_probability(a, d))
    return pd.Series(out)


def walk_curves_between_stops(stops: DataFrame, max_distance_m: float = 500.0) -> DataFrame:
    """Stop-pair walk legs: haversine distance (C9, JVM trig) + walk-time
    CDF (C10) for every pair within range.  Grid-cell equi-join keeps the
    candidate space linear in |stops| (both orientations retained — a
    walk leg is directional)."""
    return (
        grid_proximity_pairs(stops, ["stop_id"], "stop_lat", "stop_lon", max_distance_m)
        .filter(F.col("stop_id_a") != F.col("stop_id_b"))
        .select(
            F.col("stop_id_a").alias("from_stop"),
            F.col("stop_id_b").alias("to_stop"),
            F.col("dist_m").alias("distance_m"),
            walk_time_curve_udf(F.col("dist_m")).alias("walk_curve"),
        )
    )


def transfer_chain(
    arrivals: DataFrame,
    departures: DataFrame,
    walk_legs: DataFrame,
) -> DataFrame:
    """One journey hop: arrival curve at stop A ⊕ walk(A→B) = earliest
    feasible departure curve at B; transfer probability against each
    candidate departure at B (the monitor's component accumulation,
    src/monitor/journey_data.rs:166-264).

    arrivals:   (trip_id, stop_id, arrival_curve)   — absolute-seconds CDFs
    departures: (trip_id, stop_id, departure_curve)
    walk_legs:  from walk_curves_between_stops
    """
    a = arrivals.select(
        F.col("trip_id").alias("arr_trip"),
        F.col("stop_id").alias("from_stop"),
        "arrival_curve",
    )
    d = departures.select(
        F.col("trip_id").alias("dep_trip"),
        F.col("stop_id").alias("to_stop"),
        "departure_curve",
    )
    hops = (
        a.join(walk_legs, "from_stop")
        .withColumn(
            "reach_curve", convolve_udf(F.col("arrival_curve"), F.col("walk_curve"))
        )
        .join(d, "to_stop")
        .filter(F.col("arr_trip") != F.col("dep_trip"))
        .withColumn(
            "transfer_probability",
            transfer_probability_udf(F.col("reach_curve"), F.col("departure_curve")),
        )
    )
    return hops.select(
        "arr_trip", "from_stop", "dep_trip", "to_stop", "distance_m",
        "reach_curve", "transfer_probability",
    )
