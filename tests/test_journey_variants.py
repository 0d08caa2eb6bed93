"""Journey math (walk/convolve/transfer UDFs), variant grouping, and
scheduled predictions vs pure-Python oracles."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark import schemas as S
from dystonse_gtfs_data_spark.curves.core import (
    Curve,
    convolve_cdfs,
    transfer_probability,
    walk_time_curve,
)
from dystonse_gtfs_data_spark.operators.journey import (
    convolve_udf,
    transfer_chain,
    transfer_probability_udf,
    walk_curves_between_stops,
)
from dystonse_gtfs_data_spark.operators.scheduled import (
    active_trip_instances,
    generate_scheduled_predictions,
)
from dystonse_gtfs_data_spark.operators.variants import master_variants
from dystonse_gtfs_data_spark.sources.demo import build_schedule


def _curve_rows(xs, ys):
    return [{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)]


class TestJourneyUdfs:
    def test_convolve_udf_matches_core(self, spark):
        a = _curve_rows([0.0, 600.0], [0.0, 1.0])
        b = _curve_rows([99.0, 101.0], [0.0, 1.0])
        df = spark.createDataFrame(
            [(a, b)],
            "a array<struct<x: float, y: float>>, b array<struct<x: float, y: float>>",
        )
        out = df.select(convolve_udf(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
        expected = convolve_cdfs(Curve([0.0, 600.0], [0.0, 1.0]), Curve([99.0, 101.0], [0.0, 1.0]))
        np.testing.assert_allclose([p["x"] for p in out], expected.xs, rtol=1e-6)
        np.testing.assert_allclose([p["y"] for p in out], expected.ys, rtol=1e-6, atol=1e-7)

    def test_transfer_probability_udf_matches_core(self, spark):
        arr = _curve_rows([0.0, 100.0], [0.0, 1.0])
        dep = _curve_rows([50.0, 150.0], [0.0, 1.0])
        df = spark.createDataFrame(
            [(arr, dep)],
            "a array<struct<x: float, y: float>>, b array<struct<x: float, y: float>>",
        )
        got = df.select(transfer_probability_udf("a", "b").alias("p")).collect()[0]["p"]
        expected = transfer_probability(Curve([0.0, 100.0], [0.0, 1.0]), Curve([50.0, 150.0], [0.0, 1.0]))
        assert got == pytest.approx(expected, abs=1e-9)

    def test_walk_time_bounds_udf_matches_full_curve(self, spark):
        # the endpoint-only UDF must agree with min_x/max_x of the full
        # curve the 3-UDF path would have built (incl. the <20 m flat
        # branch, nulls, and repeated distances hitting the memo)
        from dystonse_gtfs_data_spark.operators.journey import walk_time_bounds_udf

        dists = [5.0, 19.999, 20.0, 137.5, 137.5, 499.0, 500.0, 1200.0, None]
        df = spark.createDataFrame([(d,) for d in dists], "dist_m double")
        got = (
            df.withColumn("b", walk_time_bounds_udf(F.col("dist_m")))
            .select("dist_m", "b.min_walk_s", "b.max_walk_s")
            .collect()
        )
        for r in got:
            if r["dist_m"] is None:
                assert r["min_walk_s"] is None and r["max_walk_s"] is None
                continue
            c = walk_time_curve(r["dist_m"])
            assert r["min_walk_s"] == pytest.approx(float(c.min_x()), abs=1e-9)
            assert r["max_walk_s"] == pytest.approx(float(c.max_x()), abs=1e-9)

    def test_walk_legs_and_chain(self, spark):
        sched = build_schedule(spark)
        legs = walk_curves_between_stops(sched["stops"], max_distance_m=400.0)
        leg_rows = legs.collect()
        assert leg_rows
        for r in leg_rows[:10]:
            ys = [p["y"] for p in r["walk_curve"]]
            assert ys[0] == 0.0 and ys[-1] == 1.0
        arrivals = sched["stop_times"].select(
            "trip_id", "stop_id",
            F.array(
                F.struct((F.col("arrival_time") - 60).cast("float").alias("x"), F.lit(0.0).cast("float").alias("y")),
                F.struct((F.col("arrival_time") + 60).cast("float").alias("x"), F.lit(1.0).cast("float").alias("y")),
            ).alias("arrival_curve"),
        )
        departures = sched["stop_times"].select(
            "trip_id", "stop_id",
            F.array(
                F.struct(F.col("departure_time").cast("float").alias("x"), F.lit(0.0).cast("float").alias("y")),
                F.struct((F.col("departure_time") + 120).cast("float").alias("x"), F.lit(1.0).cast("float").alias("y")),
            ).alias("departure_curve"),
        )
        hops = transfer_chain(arrivals, departures, legs).collect()
        assert hops
        for h in hops:
            assert 0.0 <= h["transfer_probability"] <= 1.0
        # a departure hours after the arrival must be near-certain
        sure = [h for h in hops if h["transfer_probability"] > 0.99]
        assert sure

    def test_journey_chain_accumulation(self, spark):
        from dystonse_gtfs_data_spark.operators.journey import journey_chain

        sched = build_schedule(spark)
        rows = journey_chain(
            sched["stops"], sched["stop_times"], max_walk_m=400.0
        ).collect()
        assert rows
        for r in rows:
            # only 3-leg chains: trip2 differs, walk leg is real
            assert r["trip1"] != r["trip2"]
            assert 0.0 < r["walk_m"] <= 400.0
            assert 0.0 <= r["journey_probability"] <= 1.0
        # the demo fixture's feasible chain families: t_sub (ends s9) →
        # walk → t_long, and t_long (ends s15) → walk → t_sub; t_short
        # is geographically isolated (stops ~1.1 km apart)
        assert {r["trip1"] for r in rows} == {"t_sub", "t_long"}
        assert {r["trip2"] for r in rows} == {"t_long", "t_sub"}
        # t_sub arrives s9 at 09:15:30, every t_long departure is ≤09:00
        # → the accumulated probability of every t_sub→t_long chain
        # collapses to 0 even though the first-leg boarding prob is 1
        assert all(
            r["journey_probability"] < 0.01
            for r in rows
            if r["trip1"] == "t_sub"
        )
        # final arrival median = scheduled arrival + 30 s (two-knot
        # synthetic curve arr-60 → arr+120 evaluated at y=0.5)
        st = {
            (t, s): arr
            for t, _seq, s, arr, _dep in __import__(
                "dystonse_gtfs_data_spark.sources.demo", fromlist=["schedule_rows"]
            ).schedule_rows()["stop_times"]
        }
        for r in rows[:10]:
            assert (
                r["final_arrival_median"] == st[(r["trip2"], r["final_stop"])] + 30.0
            )


class TestMasterVariants:
    def test_subsequence_grouping(self, spark):
        sched = build_schedule(spark)
        out = {r["route_variant"]: r for r in master_variants(sched["trips"], sched["stop_times"]).collect()}
        # t_sub (102) covers stops s5..s9 — a contiguous subsequence of t_long (101)
        assert out[101]["master_variant"] == 101
        assert out[102]["master_variant"] == 101
        assert out[102]["reversed"] is False
        # short route is its own master on its own route
        assert out[201]["master_variant"] == 201

    def test_reversed_containment(self, spark):
        trips = spark.createDataFrame(
            [("fwd", "r", "svc", None, 1), ("rev", "r", "svc", None, 2)], S.TRIPS
        )
        st = spark.createDataFrame(
            [("fwd", i + 1, f"s{i}", None, None) for i in range(5)]
            + [("rev", i + 1, f"s{4 - i}", None, None) for i in range(5)],
            S.STOP_TIMES,
        )
        out = {r["route_variant"]: r for r in master_variants(trips, st).collect()}
        masters = {out[1]["master_variant"], out[2]["master_variant"]}
        assert len(masters) == 1  # one covers the other, reversed
        covered = 2 if out[2]["master_variant"] == 1 else 1
        assert out[covered]["reversed"] is True


class TestScheduledPredictions:
    def test_active_instances_two_service_day_rule(self, spark):
        sched = build_schedule(spark)
        # window on Tue Jan 9 at 00:30: the short trip departing Mon 25:00
        # (= Tue 01:00) must appear as a MONDAY instance
        inst = active_trip_instances(
            sched["trips"], sched["calendar"], sched["stop_times"],
            dt.datetime(2024, 1, 9, 0, 30), dt.datetime(2024, 1, 9, 2, 0),
        ).collect()
        short = [r for r in inst if r["trip_id"] == "t_short"]
        assert dt.date(2024, 1, 8) in {r["trip_start_date"] for r in short}

    def test_generate_scheduled_predictions(self, spark):
        from dystonse_gtfs_data_spark.operators.default_curves import default_statistics
        from dystonse_gtfs_data_spark.operators.specific_curves import (
            enrich_records,
            specific_statistics,
            stop_indexed,
        )
        from dystonse_gtfs_data_spark.sources.demo import build_records as demo_records

        sched = build_schedule(spark)
        records = demo_records(spark)
        sti = stop_indexed(sched["stop_times"])
        stats = specific_statistics(records, sched["stop_times"]).unionByName(
            default_statistics(enrich_records(records, sti), sched["routes"])
        )
        preds = generate_scheduled_predictions(
            sched["trips"], sched["calendar"], sched["stop_times"], sched["routes"],
            stats,
            window_begin=dt.datetime(2024, 1, 8, 6, 0),
            window_end=dt.datetime(2024, 1, 9, 6, 0),
        ).collect()
        assert preds
        # schedule-origin, no basis → SemiSpecific for covered stops of the
        # known variant, ladder precisions elsewhere; never Specific (0 needs a basis)
        precisions = {r["precision_type"] for r in preds}
        assert S.PRECISION_SEMI_SPECIFIC in precisions
        assert S.PRECISION_SPECIFIC not in precisions
        assert all(r["origin_type"] == S.ORIGIN_SCHEDULE for r in preds)
        # the Monday 25:00 short trip contributes Tuesday-morning rows
        tue_rows = [
            r for r in preds
            if r["trip_id"] == "t_short" and r["trip_start_date"] == dt.date(2024, 1, 8)
        ]
        assert tue_rows
        for r in tue_rows:
            assert r["prediction_min"] >= dt.datetime(2024, 1, 9, 0, 0)
