"""S11 (data side): visual-schedule preparation — the per-variant
time/space polylines the reference renders as PNGs
(src/analyser/visual_schedule.rs).  Rendering stays out of the engine;
this produces the plot-ready table: one row per (vehicle, stop) with
scheduled and realized times, grouped under a master variant so
sub-trip variants draw on the same axis (E3), with the ≥10-rows guard
(src/analyser/visual_schedule.rs:168)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import service_day_timestamp
from .specific_curves import VEHICLE_KEY, stop_indexed
from .variants import master_variants

MIN_ROWS_FOR_SCHEDULE = 10


def visual_schedule_data(
    records: DataFrame,
    trips: DataFrame,
    stop_times: DataFrame,
) -> DataFrame:
    """Per (route_id, master_variant, vehicle, stop_index): scheduled and
    realized arrival/departure timestamps.  Zero delays are treated as
    "no data" for the realized line (F8,
    src/analyser/visual_schedule.rs:579-581)."""
    from ..sources.tables import maybe_broadcast

    # size-guarded: stop_times is schedule-sized; masters is bounded by
    # the variant count but still schedule-derived
    sti = maybe_broadcast(
        stop_indexed(stop_times).select(
            "trip_id", "stop_sequence", "stop_index", "arrival_time", "departure_time"
        )
    )
    masters = maybe_broadcast(master_variants(trips, stop_times))
    r = records.join(sti, ["trip_id", "stop_sequence"]).join(
        masters, ["route_id", "route_variant"]
    )
    sched_arr = service_day_timestamp(F.col("trip_start_date"), F.col("arrival_time"))
    sched_dep = service_day_timestamp(F.col("trip_start_date"), F.col("departure_time"))

    def realized(sched, delay_col):
        d = F.col(delay_col)
        return F.when(
            d.isNotNull() & (d != 0), F.timestamp_seconds(sched.cast("double") + d)
        )

    rows = r.select(
        "route_id",
        "master_variant",
        "route_variant",
        "reversed",
        *VEHICLE_KEY,
        "stop_index",
        sched_arr.alias("scheduled_arrival"),
        sched_dep.alias("scheduled_departure"),
        realized(sched_arr, "delay_arrival").alias("realized_arrival"),
        realized(sched_dep, "delay_departure").alias("realized_departure"),
    )
    w = Window.partitionBy("route_id", "master_variant")
    return (
        rows.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") >= MIN_ROWS_FOR_SCHEDULE)
        .drop("_n")
    )
