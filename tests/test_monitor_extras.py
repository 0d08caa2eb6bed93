"""Visual-schedule data prep (S11), trip resolution (J9), failed-file
report (S3 quarantine)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.monitor import resolve_trip
from dystonse_gtfs_data_spark.operators.visual_schedule import visual_schedule_data
from dystonse_gtfs_data_spark.sources.demo import (
    N_VEHICLES,
    build_records,
    build_schedule,
)
from dystonse_gtfs_data_spark.sources.rt import (
    decode_feed_messages,
    failed_feed_files,
    fake_decoder,
)


@pytest.fixture(scope="module")
def schedule(spark):
    return build_schedule(spark)


class TestVisualSchedule:
    def test_polyline_rows(self, spark, schedule):
        records = build_records(spark)
        out = visual_schedule_data(records, schedule["trips"], schedule["stop_times"])
        rows = out.filter(F.col("route_variant") == 101).limit(200).collect()
        assert rows
        for r in rows:
            # realized = scheduled + delay; zero-delay treated as no-data
            if r["realized_arrival"] is not None:
                assert r["realized_arrival"] != r["scheduled_arrival"]
            assert r["master_variant"] == 101
        # sub-trip variant 102 has no records → only variant 101 present,
        # but it would group under master 101 if it had data
        assert out.filter(F.col("route_variant") == 102).count() == 0

    def test_min_rows_guard(self, spark, schedule):
        one = build_records(spark).limit(5)
        out = visual_schedule_data(one, schedule["trips"], schedule["stop_times"])
        assert out.count() == 0  # < 10 rows → suppressed


class TestResolveTrip:
    def test_exact_resolution(self, spark, schedule):
        out = resolve_trip(
            schedule["trips"],
            schedule["routes"],
            schedule["stop_times"],
            schedule["stops"],
            headsign="Downtown",
            route_short_name="R1",
            route_type=3,
            stop_name="Stop 3",
            departure_seconds=8 * 3600 + 3 * 240,
        ).collect()
        assert len(out) == 1
        assert out[0]["trip_id"] == "t_long"
        assert out[0]["stop_sequence"] == 4

    def test_extended_stop_match(self, spark, schedule):
        # Stop 2 is ~55 m from Stop 3 → inside the 300 m extended set, so
        # searching by the neighbor's name still resolves the departure
        out = resolve_trip(
            schedule["trips"], schedule["routes"], schedule["stop_times"], schedule["stops"],
            headsign="Downtown", route_short_name="R1", route_type=3,
            stop_name="Stop 2", departure_seconds=8 * 3600 + 3 * 240,
        ).collect()
        assert {r["stop_id"] for r in out} == {"s3"}

    def test_wrong_type_no_match(self, spark, schedule):
        out = resolve_trip(
            schedule["trips"], schedule["routes"], schedule["stop_times"], schedule["stops"],
            headsign="Downtown", route_short_name="R1", route_type=0,
            stop_name="Stop 3", departure_seconds=8 * 3600 + 3 * 240,
        ).collect()
        assert out == []


class TestFailedFiles:
    def test_quarantine_report(self, spark, tmp_path):
        good = tmp_path / "feed-2024-01-02T08-00-00.pb"
        good.write_text(
            "trip_id,start_date,start_time,route_id,stop_id,stop_sequence,arrival_delay,departure_delay\n"
            "t1,20240102,08:00:00,r1,s0,1,60,60\n"
        )
        bad = tmp_path / "feed-2024-01-02T08-02-00.pb"
        bad.write_bytes(b"\xff\xfe\x00garbage")
        files = spark.read.format("binaryFile").load(str(tmp_path))
        decoded = decode_feed_messages(files, fake_decoder)
        failed = failed_feed_files(files, decoded).collect()
        assert len(failed) == 1
        assert failed[0]["path"].endswith("feed-2024-01-02T08-02-00.pb")


class TestTripDescriptor:
    def test_roundtrip_and_greedy_nach(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.functions.text import (
            format_trip_descriptor,
            parse_trip_descriptor,
        )

        df = spark.createDataFrame(
            [
                # headsign CONTAINING " nach " — greedy (.+) must bind the
                # route name through the first separator
                (3, "420", "Fahrt nach Hause", 21 * 3600 + 39 * 60),
                (0, "RE1", "Hauptbahnhof", 25 * 3600),  # >24:00:00 trip
            ],
            ["rt", "name", "hs", "dep"],
        )
        out = (
            df.withColumn(
                "d",
                format_trip_descriptor(
                    F.col("rt"), F.col("name"), F.col("hs"), F.col("dep")
                ),
            )
            .withColumn("p", parse_trip_descriptor(F.col("d")))
            .collect()
        )
        by_name = {r["name"]: r for r in out}
        bus = by_name["420"]
        assert bus["d"] == "Bus 420 nach Fahrt nach Hause um 21:39"
        # greedy: route_name swallows up to the LAST " nach "
        assert bus["p"]["route_name"] == "420 nach Fahrt"
        assert bus["p"]["trip_headsign"] == "Hause"
        assert bus["p"]["departure_hhmm"] == "21:39"
        tram = by_name["RE1"]
        assert tram["d"].endswith("um 01:00")  # 25:00 wall-clock
        assert tram["p"]["route_type_label"] == "Tram"

    def test_parse_rejects_malformed(self, spark):
        from pyspark.sql import functions as F

        from dystonse_gtfs_data_spark.functions.text import parse_trip_descriptor

        out = (
            spark.range(1)
            .select(parse_trip_descriptor(F.lit("not a descriptor")).alias("p"))
            .collect()[0]["p"]
        )
        assert out["route_name"] == "" and out["departure_hhmm"] == ""
