"""Explicit StructType schemas for every table in the engine
(schema-first, like the reference's hand-declared SQL column lists,
src/analyser/specific_curves.rs:82-98; shapes from FIXTURES.md).

Conventions (FIXTURES.md):
- id columns are strings (src/types/db_item.rs:15-18)
- *_time columns are integer seconds from service-day midnight and may
  exceed 86400 or be negative (GTFS >24:00:00; src/types/gtfs_time.rs:53-56)
- delays are nullable integer seconds
- timestamps are UTC (engine decision fixing the reference's DST bugs)
"""

from __future__ import annotations

from pyspark.sql import types as T

from .curves.udfs import CURVE_TYPE

AGENCY = T.StructType(
    [
        T.StructField("agency_id", T.StringType(), False),
        T.StructField("agency_name", T.StringType(), True),
    ]
)

ROUTES = T.StructType(
    [
        T.StructField("route_id", T.StringType(), False),
        T.StructField("agency_id", T.StringType(), True),
        T.StructField("route_short_name", T.StringType(), True),
        T.StructField("route_type", T.IntegerType(), True),
    ]
)

STOPS = T.StructType(
    [
        T.StructField("stop_id", T.StringType(), False),
        T.StructField("stop_name", T.StringType(), True),
        T.StructField("stop_lat", T.DoubleType(), True),
        T.StructField("stop_lon", T.DoubleType(), True),
    ]
)

TRIPS = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("route_id", T.StringType(), False),
        T.StructField("service_id", T.StringType(), True),
        T.StructField("trip_headsign", T.StringType(), True),
        # dystonse fork extension: id of the stop-sequence pattern
        # (src/analyser/specific_curves.rs:122-123)
        T.StructField("route_variant", T.LongType(), True),
    ]
)

STOP_TIMES = T.StructType(
    [
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("stop_sequence", T.IntegerType(), False),
        T.StructField("stop_id", T.StringType(), False),
        T.StructField("arrival_time", T.IntegerType(), True),
        T.StructField("departure_time", T.IntegerType(), True),
    ]
)

CALENDAR = T.StructType(
    [T.StructField("service_id", T.StringType(), False)]
    + [
        T.StructField(d, T.BooleanType(), True)
        for d in ("monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday")
    ]
    + [
        T.StructField("start_date", T.DateType(), True),
        T.StructField("end_date", T.DateType(), True),
    ]
)

# flattened GTFS-rt stop_time_updates (post S2 decode+explode)
RT_UPDATES = T.StructType(
    [
        T.StructField("feed_file", T.StringType(), True),
        T.StructField("header_timestamp", T.TimestampType(), True),
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("start_date", T.StringType(), True),  # 'yyyyMMdd'
        T.StructField("start_time", T.StringType(), True),  # 'HH:MM:SS', may exceed 24h
        T.StructField("route_id", T.StringType(), True),
        T.StructField("stop_id", T.StringType(), True),
        T.StructField("stop_sequence", T.IntegerType(), True),
        T.StructField("arrival_delay", T.IntegerType(), True),
        T.StructField("departure_delay", T.IntegerType(), True),
    ]
)

# per-stop delay observations (src/importer/per_schedule_importer.rs:424-451)
RECORDS = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("route_id", T.StringType(), False),
        T.StructField("route_variant", T.LongType(), True),
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("trip_start_date", T.DateType(), True),
        T.StructField("trip_start_time", T.IntegerType(), True),
        T.StructField("stop_sequence", T.IntegerType(), False),
        T.StructField("stop_id", T.StringType(), True),
        T.StructField("time_of_recording", T.TimestampType(), True),
        T.StructField("delay_arrival", T.IntegerType(), True),
        T.StructField("delay_departure", T.IntegerType(), True),
        T.StructField("schedule_file_name", T.StringType(), True),
    ]
)

RECORDS_KEY = [
    "source",
    "route_id",
    "route_variant",
    "trip_id",
    "trip_start_date",
    "trip_start_time",
    "stop_sequence",
]

# delay-distribution predictions (src/importer/mod.rs:579-611)
PREDICTIONS = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("event_type", T.ByteType(), False),  # 1 arrival, 2 departure
        T.StructField("stop_id", T.StringType(), True),
        T.StructField("stop_sequence", T.IntegerType(), False),
        T.StructField("route_id", T.StringType(), False),
        T.StructField("trip_id", T.StringType(), False),
        T.StructField("trip_start_date", T.DateType(), True),
        T.StructField("trip_start_time", T.IntegerType(), True),
        T.StructField("prediction_min", T.TimestampType(), True),
        T.StructField("prediction_max", T.TimestampType(), True),
        T.StructField("precision_type", T.ByteType(), True),  # 0..6
        T.StructField("origin_type", T.ByteType(), True),  # 0 unknown, 1 realtime, 2 schedule
        T.StructField("sample_size", T.IntegerType(), True),
        T.StructField("prediction_curve", CURVE_TYPE, True),
        T.StructField("schedule_file_name", T.StringType(), True),
    ]
)

PREDICTIONS_KEY = [
    "source",
    "event_type",
    "stop_sequence",
    "route_id",
    "trip_id",
    "trip_start_date",
    "trip_start_time",
]

# the statistics tree flattened (src/types/types.md:1-12 → one table)
DELAY_CURVES = T.StructType(
    [
        T.StructField("scope", T.StringType(), False),  # specific|semi_specific|default
        T.StructField("route_id", T.StringType(), True),
        T.StructField("route_variant", T.LongType(), True),
        T.StructField("start_stop_index", T.IntegerType(), True),
        T.StructField("end_stop_index", T.IntegerType(), True),
        T.StructField("stop_index", T.IntegerType(), True),  # semi_specific only
        T.StructField("route_type", T.IntegerType(), True),  # default only
        T.StructField("route_section", T.StringType(), True),  # default only
        T.StructField("time_slot_id", T.IntegerType(), True),  # 1..12, 12=DEFAULT
        T.StructField("event_type", T.IntegerType(), False),
        T.StructField("focus_delay", T.FloatType(), True),  # curve-set member key
        T.StructField("curve", CURVE_TYPE, True),
        T.StructField("precision_type", T.IntegerType(), True),
        T.StructField("sample_size", T.IntegerType(), True),
    ]
)

# PrecisionType (src/types/mod.rs:74-99)
PRECISION_SPECIFIC = 0
PRECISION_FALLBACK_SPECIFIC = 1
PRECISION_SEMI_SPECIFIC = 2
PRECISION_GENERAL = 3
PRECISION_FALLBACK_GENERAL = 4
PRECISION_SUPER_GENERAL = 5
PRECISION_UNKNOWN = 6

# EventType (src/types/event_type.rs:17-30)
EVENT_ARRIVAL = 1
EVENT_DEPARTURE = 2

# OriginType (src/types/mod.rs:42-59)
ORIGIN_UNKNOWN = 0
ORIGIN_REALTIME = 1
ORIGIN_SCHEDULE = 2
