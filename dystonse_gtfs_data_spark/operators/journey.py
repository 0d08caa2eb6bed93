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


_WALK_BOUNDS_TYPE = T.StructType(
    [
        T.StructField("min_walk_s", T.DoubleType()),
        T.StructField("max_walk_s", T.DoubleType()),
    ]
)


@F.pandas_udf(_WALK_BOUNDS_TYPE)
def walk_time_bounds_udf(distance_m: pd.Series) -> pd.DataFrame:
    """C10 endpoints only: one Arrow pass that builds the REAL
    ``walk_time_curve`` (so the constructor + simplify path is exercised)
    but ships back just ``(min_x, max_x)`` instead of the full curve —
    proximity-pair volume grows quadratically with stop density, and the
    full-curve variant paid three UDF invocations plus an
    ``array<struct>`` round-trip per pair only to read two endpoints.
    Distances repeat heavily across pairs (grid geometry), so curves are
    built once per distinct distance per batch."""
    bounds: dict[float, tuple[float, float]] = {}
    for d in pd.unique(distance_m.dropna()):
        c = walk_time_curve(float(d))
        bounds[float(d)] = (float(c.min_x()), float(c.max_x()))

    def _get(d, i):
        if d is None or d != d:
            return None
        return bounds[float(d)][i]

    return pd.DataFrame(
        {
            "min_walk_s": [_get(d, 0) for d in distance_m],
            "max_walk_s": [_get(d, 1) for d in distance_m],
        }
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


def journey_chain(
    stops: DataFrame,
    stop_times: DataFrame,
    max_walk_m: float = 400.0,
) -> DataFrame:
    """Full ≥3-leg journey accumulation — the monitor's alternating
    Stop → Trip → Stop → Walk → Stop → Trip → Stop component chain
    (src/monitor/journey_data.rs:166-485), end to end:

    - journey start: ±30 s step curve around t₀ = first departure − 120 s
      (journey_data.rs:318-323), probability 1
    - board trip 1 at its first stop: the accumulated probability
      multiplies by P(transfer into the departure curve)
      (journey_data.rs:441-447)
    - ride to the trip's last stop — the stop component takes the trip's
      own arrival curve; feasibility lives in the probability, not the
      curve (journey_data.rs:283-292)
    - walk to every stop within ``max_walk_m``: arrival ⊕ walk-duration
      convolution, probability carried unchanged — "the chance to miss
      the transfer into a walk is zero" (journey_data.rs:299-311)
    - board trip 2 at any of its stop_times at the walk target, alight
      at every LATER stop (the ring-route stop_sequence guard,
      journey_data.rs:278-287)

    Output: one row per feasible chain with the accumulated journey
    probability and the median of the final arrival curve.

    Scale shape: every join is an equi-join on stop/trip keys (walk legs
    ride the grid-cell join — linear candidate space), curve algebra is
    Arrow-batched pandas UDFs over bounded two-knot synthetic curves,
    and the fan-out is bounded by walk radius × trip length.
    """
    from pyspark.sql import Window

    from ..curves.udfs import curve_x_at_y

    st = stop_times

    def _step(x0, x1):
        # absolute-seconds CDF through the float32 storage boundary
        return F.array(
            F.struct(
                x0.cast("float").alias("x"), F.lit(0.0).cast("float").alias("y")
            ),
            F.struct(
                x1.cast("float").alias("x"), F.lit(1.0).cast("float").alias("y")
            ),
        )

    w_asc = Window.partitionBy("trip_id").orderBy("stop_sequence")
    w_desc = Window.partitionBy("trip_id").orderBy(F.desc("stop_sequence"))
    leg1 = (
        st.withColumn("rn", F.row_number().over(w_asc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("trip_id").alias("trip1"),
            F.col("stop_id").alias("board_stop"),
            _step(
                F.col("departure_time") - 150, F.col("departure_time") - 90
            ).alias("start_curve"),
            _step(
                F.col("departure_time"), F.col("departure_time") + 180
            ).alias("dep1_curve"),
        )
        .withColumn(
            "prob1",
            transfer_probability_udf(F.col("start_curve"), F.col("dep1_curve")),
        )
    )
    ride1 = (
        st.withColumn("rn", F.row_number().over(w_desc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("trip_id").alias("trip1"),
            F.col("stop_id").alias("alight1_stop"),
            _step(F.col("arrival_time") - 60, F.col("arrival_time") + 120).alias(
                "arr1_curve"
            ),
        )
    )
    walk = walk_curves_between_stops(stops, max_distance_m=max_walk_m).select(
        F.col("from_stop").alias("alight1_stop"),
        F.col("to_stop").alias("walk_stop"),
        "distance_m",
        "walk_curve",
    )
    board2 = st.select(
        F.col("trip_id").alias("trip2"),
        F.col("stop_id").alias("walk_stop"),
        F.col("stop_sequence").alias("board2_seq"),
        _step(F.col("departure_time"), F.col("departure_time") + 180).alias(
            "dep2_curve"
        ),
    )
    alight2 = st.select(
        F.col("trip_id").alias("trip2"),
        F.col("stop_sequence").alias("alight2_seq"),
        F.col("stop_id").alias("final_stop"),
        _step(F.col("arrival_time") - 60, F.col("arrival_time") + 120).alias(
            "arr2_curve"
        ),
    )
    chains = (
        leg1.join(ride1, "trip1")
        .join(walk, "alight1_stop")
        .withColumn(
            "reach_curve", convolve_udf(F.col("arr1_curve"), F.col("walk_curve"))
        )
        .join(board2, "walk_stop")
        .filter(F.col("trip2") != F.col("trip1"))
        .withColumn(
            "p_board2",
            transfer_probability_udf(F.col("reach_curve"), F.col("dep2_curve")),
        )
        .join(alight2, "trip2")
        .filter(F.col("alight2_seq") > F.col("board2_seq"))
    )
    return chains.select(
        "trip1",
        "board_stop",
        "alight1_stop",
        "walk_stop",
        "trip2",
        "final_stop",
        F.round("distance_m", 3).alias("walk_m"),
        F.round(F.col("prob1") * F.col("p_board2"), 6).alias(
            "journey_probability"
        ),
        F.round(curve_x_at_y(F.col("arr2_curve"), F.lit(0.5)), 3).alias(
            "final_arrival_median"
        ),
    )
