"""Deterministic GTFS-shaped demo/fixture data (FIXTURES.md schemas):
2 routes, 3 variants (one ≥16 stops, one short with >24:00:00 times,
one sub-trip of the long one), 60 vehicles of realtime data with seeded
delays, plus the edge cases the fixtures doc calls for (null delays,
unknown trips, duplicate updates).  Used by the domain tests and by the
rows-only GTFS queries in the driver contract."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import SparkSession

from .. import schemas as S

MONDAY = dt.date(2024, 1, 1)  # a Monday; 08:xx is slot 3 (workday 8-12)

N_LONG_STOPS = 16
N_SHORT_STOPS = 6
N_VEHICLES = 60


def schedule_rows() -> dict[str, list[tuple]]:
    """The schedule fixture as plain Python rows — shared by the Spark
    builders and the pyarrow oracle materializer (sources/demo_oracle.py)
    so both engines see byte-identical inputs."""
    st_rows = []
    for i in range(N_LONG_STOPS):
        # departures 08:00, 08:04, ...; arrivals 30 s earlier
        dep = 8 * 3600 + i * 240
        st_rows.append(("t_long", i + 1, f"s{i}", dep - 30, dep))
    for i in range(N_SHORT_STOPS):
        dep = 25 * 3600 + i * 300  # >24:00:00 times (GTFS next-day service)
        st_rows.append(("t_short", i + 1, f"s{i + 20}", dep - 30, dep))
    for i in range(5, 10):  # sub-trip covers stops s5..s9 of the long route
        dep = 9 * 3600 + (i - 5) * 240
        st_rows.append(("t_sub", i - 4, f"s{i}", dep - 30, dep))
    return {
        "routes": [("r1", "a1", "R1", 3), ("r2", "a1", "R2", 0)],
        "trips": [
            ("t_long", "r1", "svc_wk", "Downtown", 101),
            ("t_short", "r2", "svc_wk", "Uptown", 201),
            ("t_sub", "r1", "svc_wk", "Downtown", 102),  # contiguous subsequence
        ],
        "stop_times": st_rows,
        "stops": [
            (f"s{i}", f"Stop {i}", 53.0 + i * 0.0005, 8.8)  # ~55 m apart: clusters
            for i in range(N_LONG_STOPS)
        ]
        + [
            (f"s{i + 20}", f"Stop {i + 20}", 54.0 + i * 0.01, 9.9)
            for i in range(N_SHORT_STOPS)
        ],
        "calendar": [
            ("svc_wk", True, True, True, True, True, False, False, MONDAY, dt.date(2024, 12, 31))
        ],
    }


def build_schedule(spark: SparkSession):
    from .tables import _ensure_session_confs

    _ensure_session_confs(spark)  # UTC semantics even on a caller's session
    rows = schedule_rows()
    return {
        "routes": spark.createDataFrame(rows["routes"], S.ROUTES),
        "trips": spark.createDataFrame(rows["trips"], S.TRIPS),
        "stop_times": spark.createDataFrame(rows["stop_times"], S.STOP_TIMES),
        "stops": spark.createDataFrame(rows["stops"], S.STOPS),
        "calendar": spark.createDataFrame(rows["calendar"], S.CALENDAR),
    }


def delay_matrix(seed: int = 5) -> np.ndarray:
    """(N_VEHICLES, N_LONG_STOPS) integer delays, reproducible."""
    rng = np.random.default_rng(seed)
    start = rng.normal(60, 90, size=(N_VEHICLES, 1))
    drift = rng.normal(15, 30, size=(N_VEHICLES, N_LONG_STOPS)).cumsum(axis=1)
    return np.round(start + drift).astype(int)


def records_rows() -> list[tuple]:
    """Direct RECORDS rows for the long trip: one row per vehicle × stop,
    arrival delay = matrix value, departure delay = arrival + jitter.
    Stop 15 (index 14, seq 15) reports for only 15 vehicles (< 21-pair
    guard); stop 16 never reports (gap-fill target)."""
    delays = delay_matrix()
    rng = np.random.default_rng(99)
    jitter = rng.integers(-24, 24, size=delays.shape)
    rows = []
    for v in range(N_VEHICLES):
        date = MONDAY + dt.timedelta(days=int(v % 5))  # Mon..Fri
        # distinct start_time per vehicle: the vehicle identity is
        # (trip_id, trip_start_date, trip_start_time) and dates repeat
        start_time = 8 * 3600 + v * 60
        for i in range(N_LONG_STOPS):
            seq = i + 1
            if i == 14 and v >= 15:
                continue
            if i == 15:
                continue
            d_arr = int(delays[v, i])
            d_dep = int(delays[v, i] + jitter[v, i])
            rows.append(
                (
                    "test",
                    "r1",
                    101,
                    "t_long",
                    date,
                    start_time,
                    seq,
                    f"s{i}",
                    dt.datetime(date.year, date.month, date.day, 8, 0, seq),
                    d_arr,
                    d_dep,
                    "sched_v1",
                )
            )
    return rows


def build_records(spark: SparkSession):
    return spark.createDataFrame(records_rows(), S.RECORDS)


def _rt_update_rows() -> list[tuple]:
    hdr = dt.datetime(2024, 1, 1, 8, 30, 0)
    return [
        # normal update
        ("f1", hdr, "t_long", "20240101", "08:00:00", "r1", "s0", 1, 60, 72),
        # duplicate for same (trip, stop) with newer timestamp → wins
        ("f2", hdr + dt.timedelta(minutes=5), "t_long", "20240101", "08:00:00", "r1", "s0", 1, 48, 60),
        # only arrival delay
        ("f1", hdr, "t_long", "20240101", "08:00:00", "r1", "s1", 2, 120, None),
        # neither delay → dropped
        ("f1", hdr, "t_long", "20240101", "08:00:00", "r1", "s2", 3, None, None),
        # >24 h start time (short trip next-day service)
        ("f1", hdr, "t_short", "20240101", "25:00:00", "r2", "s20", 1, 30, 36),
        # unknown trip → skipped (J1 anti)
        ("f1", hdr, "t_ghost", "20240101", "08:00:00", "rX", "s0", 1, 10, 10),
        # unknown stop_sequence → skipped (J2)
        ("f1", hdr, "t_long", "20240101", "08:00:00", "r1", "s99", 99, 10, 10),
        # missing start_time → fall back to trip's first departure
        ("f1", hdr, "t_long", "20240101", None, "r1", "s3", 4, -13, -1),
    ]


def build_rt_updates(spark: SparkSession):
    """Flattened rt updates exercising the records-pipeline edge cases."""
    return spark.createDataFrame(_rt_update_rows(), S.RT_UPDATES)


def write_rt_feed_files(out_dir: str) -> list[str]:
    """Encode the demo rt updates as REAL GTFS-rt FeedMessage protobuf
    binaries (S2's wire format), one file per source feed, named with the
    filename-timestamp convention (C4) so the decode path recovers
    header_timestamp from the name.  Returns the written paths."""
    import os
    from collections import defaultdict

    from .rt import encode_feed_message

    groups: dict[tuple, list[dict]] = defaultdict(list)
    for feed, hdr, trip, sdate, stime, route, stop, seq, arr, dep in _rt_update_rows():
        groups[(feed, hdr)].append(
            {
                "trip_id": trip,
                "start_date": sdate,
                "start_time": stime,
                "route_id": route,
                "stop_id": stop,
                "stop_sequence": seq,
                "arrival_delay": arr,
                "departure_delay": dep,
            }
        )
    paths = []
    for (feed, hdr), rows in sorted(groups.items()):
        name = f"{feed}_{hdr.strftime('%Y-%m-%dT%H-%M-%S')}.pb"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as fh:
            fh.write(
                encode_feed_message(
                    rows, header_timestamp=int(hdr.replace(tzinfo=dt.timezone.utc).timestamp())
                )
            )
        paths.append(path)
    return paths


_RT_FEED_DIR: list[str] = []


def rt_feed_files_dir() -> str:
    """Process-memoized temp directory of encoded demo feed binaries."""
    if not _RT_FEED_DIR:
        import tempfile

        d = tempfile.mkdtemp(prefix="gtfs_rt_demo_")
        write_rt_feed_files(d)
        _RT_FEED_DIR.append(d)
    return _RT_FEED_DIR[0]


def wide_schedule_rows(width: int) -> dict[str, list[tuple]]:
    """A single-variant schedule whose ONE trip has ``width`` stops —
    the variant-WIDTH axis of the domain fixture (SURVEY §7 hard-part
    #4: the stop-pair curve-set explosion is O(stops²) per variant ×
    12 slots × 2 event types, src/analyser/specific_curves.rs:279-351).
    ``scale_fixture`` multiplies route COUNT; this multiplies the pair
    grid per route — a 60-stop tram line vs the demo's 16-stop bus."""
    st_rows = []
    for i in range(width):
        dep = 8 * 3600 + i * 120  # 2-min spacing: 60 stops span 08:00-10:00
        st_rows.append(("t_wide", i + 1, f"w{i}", dep - 30, dep))
    return {
        "routes": [("rw1", "a1", "RW1", 0)],
        "trips": [("t_wide", "rw1", "svc_wk", "Crosstown", 301)],
        "stop_times": st_rows,
        "stops": [
            (f"w{i}", f"Wide stop {i}", 53.0 + i * 0.0005, 8.8)
            for i in range(width)
        ],
        "calendar": [
            ("svc_wk", True, True, True, True, True, False, False, MONDAY,
             dt.date(2024, 12, 31))
        ],
    }


def wide_records_rows(width: int, vehicles: int = N_VEHICLES) -> list[tuple]:
    """vehicles × width records for the wide trip, seeded like the demo
    matrix; the LAST stop reports for only 15 vehicles so the >20-pair
    guard must prune every pair group ENDING there — pruning OUTPUT
    without the pair join exploding INPUT is the scaling property under
    test."""
    rng = np.random.default_rng(7)
    start = rng.normal(60, 90, size=(vehicles, 1))
    drift = rng.normal(15, 30, size=(vehicles, width)).cumsum(axis=1)
    delays = np.round(start + drift).astype(int)
    jitter = np.random.default_rng(98).integers(-24, 24, size=delays.shape)
    rows = []
    for v in range(vehicles):
        date = MONDAY + dt.timedelta(days=int(v % 5))
        start_time = 8 * 3600 + v * 60
        for i in range(width):
            if i == width - 1 and v >= 15:
                continue
            rows.append(
                (
                    "test",
                    "rw1",
                    301,
                    "t_wide",
                    date,
                    start_time,
                    i + 1,
                    f"w{i}",
                    dt.datetime(date.year, date.month, date.day, 8, 0,
                                min(i + 1, 59)),
                    int(delays[v, i]),
                    int(delays[v, i] + jitter[v, i]),
                    "sched_v1",
                )
            )
    return rows


def wide_fixture(
    spark: SparkSession,
    width: int,
    r: int = 1,
    vehicles: int = N_VEHICLES,
    jitter: bool = True,
):
    """(schedule, records) for the width ladder: ONE route variant with
    ``width`` stops, replicated ``r``-fold with suffixed keys exactly
    like :func:`scale_fixture` — so a run can scale the pair-grid axis
    (width² growth per variant) and the group-count axis (×r)
    independently."""
    rows = wide_schedule_rows(width)
    sched = {
        "routes": spark.createDataFrame(rows["routes"], S.ROUTES),
        "trips": spark.createDataFrame(rows["trips"], S.TRIPS),
        "stop_times": spark.createDataFrame(rows["stop_times"], S.STOP_TIMES),
        "stops": spark.createDataFrame(rows["stops"], S.STOPS),
        "calendar": spark.createDataFrame(rows["calendar"], S.CALENDAR),
    }
    records = spark.createDataFrame(
        wide_records_rows(width, vehicles), S.RECORDS
    )
    if r == 1:
        return sched, records
    return _replicate(sched, records, r, jitter)


def scale_fixture(spark: SparkSession, r: int, jitter: bool = True):
    """R-fold key-suffix replica of the demo schedule + records — the
    domain analog of tools/make_scaled_sf.py (round-7 verdict task #4).

    Every route / trip / stop / stop_time / record is copied R times
    with ``#k``-suffixed string keys and ``route_variant + k*1000``, so
    the per-variant curve groups (the reference's per-route analyser
    loop, src/analyser/specific_curves.rs:29-56) multiply by R while the
    default rollup's (route_type, section, slot) groups stay fixed —
    the realistic shape: a bigger feed adds routes, not route types.

    ``jitter=True`` adds a deterministic ±3 s per-replica delay offset
    (scaling rehearsals should not measure degenerate identical groups);
    ``jitter=False`` keeps replicas byte-identical, which makes every
    per-variant-keyed statistic EXACTLY the demo's with mapped keys —
    the replica-invariance oracle the ``gtfs_statistics_scaled``
    catalog entry hash-checks.

    Returns (schedule_dict, records_df).
    """
    sched = build_schedule(spark)
    records = build_records(spark)
    return _replicate(sched, records, r, jitter)


def _replicate(sched, records, r: int, jitter: bool):
    """R-fold key-suffix replication shared by :func:`scale_fixture`
    and :func:`wide_fixture` (see scale_fixture's docstring for the
    key/variant mapping and the jitter semantics)."""
    from pyspark.sql import functions as F

    # replica index via explode(sequence) — map-only row multiplication,
    # no join node (a broadcast crossJoin would plan as an R-row BNLJ)
    reps = F.explode(F.sequence(F.lit(0), F.lit(r - 1))).alias("_k")

    def sfx(c):
        return F.concat(F.col(c), F.lit("#"), F.col("_k").cast("string"))

    def rep(df, str_cols, variant_col: bool = False):
        out = df.select("*", reps)
        for c in str_cols:
            out = out.withColumn(c, sfx(c))
        if variant_col:
            out = out.withColumn(
                "route_variant", F.col("route_variant") + F.col("_k") * 1000
            )
        return out.drop("_k")

    sched_r = {
        "routes": rep(sched["routes"], ["route_id"]),
        "trips": rep(sched["trips"], ["trip_id", "route_id"], variant_col=True),
        "stop_times": rep(sched["stop_times"], ["trip_id", "stop_id"]),
        "stops": rep(sched["stops"], ["stop_id"]),
        "calendar": sched["calendar"],  # shared service week
    }
    jit = (
        (F.col("_k") % 7 - F.lit(3)).cast("int") if jitter else F.lit(0)
    )
    rec_r = (
        records.select("*", reps)
        .withColumn("trip_id", sfx("trip_id"))
        .withColumn("route_id", sfx("route_id"))
        .withColumn("stop_id", sfx("stop_id"))
        .withColumn("route_variant", F.col("route_variant") + F.col("_k") * 1000)
        .withColumn("delay_arrival", (F.col("delay_arrival") + jit).cast("int"))
        .withColumn(
            "delay_departure", (F.col("delay_departure") + jit).cast("int")
        )
        .drop("_k")
    )
    return sched_r, rec_r
