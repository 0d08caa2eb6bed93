"""HTTP monitor shell (monitor_http.py) — the reference's monitor
subcommand serves these routes over HTTP (src/monitor/mod.rs:102-190);
here each route must return exactly the rows the direct operator path
produces."""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from dystonse_gtfs_data_spark.monitor_http import (
    board_rows_json,
    start_monitor_server,
)
from dystonse_gtfs_data_spark.operators.monitor import (
    autocomplete_stops,
    departure_board,
)
from dystonse_gtfs_data_spark.operators.predict import (
    generate_realtime_predictions,
)
from dystonse_gtfs_data_spark.operators.specific_curves import stop_indexed
from dystonse_gtfs_data_spark.queries import demo_statistics
from dystonse_gtfs_data_spark.sources.demo import (
    build_records,
    build_schedule,
)

from pyspark.sql import functions as F


def _get(port: int, path: str):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=300
    ) as resp:
        return resp.status, json.load(resp)


@pytest.fixture(scope="module")
def served(spark):
    sched = build_schedule(spark)
    sti = stop_indexed(sched["stop_times"])
    preds = generate_realtime_predictions(
        build_records(spark),
        sti,
        sched["routes"],
        sched["trips"],
        demo_statistics(spark),
    ).persist()
    preds.count()  # materialize once; every request reuses the cache
    max_seq = sched["stop_times"].groupBy("trip_id").agg(
        F.max("stop_sequence").alias("max_stop_sequence")
    )
    server, port = start_monitor_server(
        spark, preds, stops=sched["stops"], trip_max_sequences=max_seq
    )
    yield {
        "port": port,
        "preds": preds,
        "stops": sched["stops"],
        "max_seq": max_seq,
    }
    server.shutdown()
    preds.unpersist()


class TestMonitorHTTP:
    def test_index_lists_endpoints(self, served):
        status, body = _get(served["port"], "/")
        assert status == 200
        assert "/departures" in body["endpoints"]

    def test_autocomplete_matches_operator(self, served, spark):
        status, body = _get(
            served["port"],
            "/autocomplete?" + urllib.parse.urlencode({"q": "Stop"}),
        )
        assert status == 200
        direct = [
            r["stop_name"]
            for r in autocomplete_stops(served["stops"], ["Stop"]).collect()
        ]
        assert body["names"] == direct and direct  # same rows, same order

    def test_stop_by_name_redirects(self, served):
        req = urllib.request.Request(
            f"http://127.0.0.1:{served['port']}/stop-by-name?"
            + urllib.parse.urlencode({"start": "s3"}),
        )
        opener = urllib.request.build_opener(_NoRedirect)
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(req, timeout=300)
        assert exc.value.code == 302
        assert exc.value.headers["Location"] == "/departures?stop_ids=s3"

    def test_stop_by_name_resolves_names_and_carries_window(self, served, spark):
        # a stop NAME (not id) must resolve via the stops table, and
        # optional window params must survive into the redirect so a
        # client that follows it reaches a servable /departures URL
        name = served["stops"].select("stop_name").first()["stop_name"]
        expected_ids = ",".join(
            sorted(
                r["stop_id"]
                for r in served["stops"]
                .filter(F.col("stop_name") == name)
                .select("stop_id")
                .collect()
            )
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{served['port']}/stop-by-name?"
            + urllib.parse.urlencode(
                {
                    "start": name,
                    "window_start": "2024-01-01T08:00:00",
                    "window_end": "2024-01-06T10:00:00",
                }
            ),
        )
        opener = urllib.request.build_opener(_NoRedirect)
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(req, timeout=300)
        assert exc.value.code == 302
        loc = exc.value.headers["Location"]
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(loc).query))
        assert q["stop_ids"] == expected_ids
        assert q["start"] == "2024-01-01T08:00:00"
        assert q["end"] == "2024-01-06T10:00:00"
        # ...and following it serves an actual board (200, not 500)
        status, rows = _get(served["port"], loc)
        assert status == 200 and isinstance(rows, list)

    def test_departures_match_direct_operator(self, served, spark):
        window = {
            "start": "2024-01-01T08:00:00",
            "end": "2024-01-06T10:00:00",
        }
        status, rows = _get(
            served["port"],
            "/departures?"
            + urllib.parse.urlencode(
                {"stop_ids": ",".join(f"s{i}" for i in range(16)), **window}
            ),
        )
        assert status == 200
        direct = board_rows_json(
            departure_board(
                served["preds"],
                stop_ids=[f"s{i}" for i in range(16)],
                window_min=dt.datetime(2024, 1, 1, 8, 0),
                window_max=dt.datetime(2024, 1, 6, 10, 0),
                trip_max_sequences=served["max_seq"],
            )
        )
        assert rows == direct and len(rows) > 0

    def test_unknown_route_404(self, served):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(served["port"], "/nope")
        assert exc.value.code == 404

    def test_error_page_500(self, served):
        # missing required params → the handler's generate_error_page path
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get(served["port"], "/departures?stop_ids=s1")
        assert exc.value.code == 500
        assert "error" in json.load(exc.value)


def _group_job_ids(spark, group: str, at_least: int) -> set[int]:
    """Job ids in a job group, polling until ``at_least`` have appeared
    — the status tracker is fed by the async listener bus, so a count()
    that just returned may not be registered for a few milliseconds."""
    import time as _time

    tracker = spark.sparkContext.statusTracker()
    deadline = _time.time() + 30
    while True:
        ids = set(tracker.getJobIdsForGroup(group))
        if len(ids) >= at_least or _time.time() > deadline:
            return ids
        _time.sleep(0.05)


class TestMaterializedBoards:
    WINDOW = {"start": "2024-01-01T08:00:00", "end": "2024-01-06T10:00:00"}

    def _board_path(self):
        return "/departures?" + urllib.parse.urlencode(
            {"stop_ids": ",".join(f"s{i}" for i in range(16)), **self.WINDOW}
        )

    def test_repeat_request_serves_cache_with_zero_spark_jobs(
        self, served, spark
    ):
        # SURVEY §3.3 scale-safe serving shape: the first request
        # computes the board, a repeat within the TTL must not touch
        # Spark at all.  Proof via global job ids: job ids are allocated
        # sequentially across ALL threads, so if the dummy action after
        # the cached GET lands at exactly (last dummy id + 1), the GET
        # issued zero jobs.
        server, port = start_monitor_server(
            spark,
            served["preds"],
            stops=served["stops"],
            trip_max_sequences=served["max_seq"],
            materialize_ttl=3600.0,
        )
        try:
            status, first = _get(port, self._board_path())
            assert status == 200 and len(first) > 0

            sc = spark.sparkContext
            sc.setJobGroup("mhc-probe", "job-count fence")
            try:
                sc.parallelize([0]).count()  # RDD action: exactly ONE job
                before = _group_job_ids(spark, "mhc-probe", at_least=1)
                status, second = _get(port, self._board_path())
                sc.parallelize([0]).count()
                after = _group_job_ids(
                    spark, "mhc-probe", at_least=len(before) + 1
                )
            finally:
                sc.setJobGroup(None, None)
            new = sorted(after - before)
            assert len(new) == 1, new
            assert new[0] == max(before) + 1, (
                f"cached GET ran Spark jobs: ids {max(before)}..{new[0]}"
            )
            assert status == 200 and second == first
        finally:
            server.shutdown()

    def test_cached_rows_identical_to_live_path(self, served, spark):
        server, port = start_monitor_server(
            spark,
            served["preds"],
            stops=served["stops"],
            trip_max_sequences=served["max_seq"],
            materialize_ttl=3600.0,
        )
        try:
            _, warm = _get(port, self._board_path())
            _, hit = _get(port, self._board_path())
        finally:
            server.shutdown()
        direct = board_rows_json(
            departure_board(
                served["preds"],
                stop_ids=[f"s{i}" for i in range(16)],
                window_min=dt.datetime(2024, 1, 1, 8, 0),
                window_max=dt.datetime(2024, 1, 6, 10, 0),
                trip_max_sequences=served["max_seq"],
            )
        )
        assert warm == hit == direct and len(direct) > 0

    def test_ttl_expiry_recomputes(self, served, spark):
        # injectable clock: advance past the TTL and prove the next GET
        # goes back to Spark (a foreign job id appears between fences)
        now = [0.0]
        server, port = start_monitor_server(
            spark,
            served["preds"],
            stops=served["stops"],
            trip_max_sequences=served["max_seq"],
            materialize_ttl=60.0,
            clock=lambda: now[0],
        )
        try:
            _, first = _get(port, self._board_path())
            now[0] = 61.0  # TTL elapsed → entry must be dropped
            sc = spark.sparkContext
            sc.setJobGroup("mhc-ttl", "job-count fence")
            try:
                sc.parallelize([0]).count()  # RDD action: exactly ONE job
                before = _group_job_ids(spark, "mhc-ttl", at_least=1)
                _, again = _get(port, self._board_path())
                sc.parallelize([0]).count()
                after = _group_job_ids(
                    spark, "mhc-ttl", at_least=len(before) + 1
                )
            finally:
                sc.setJobGroup(None, None)
            new = sorted(after - before)
            assert new and new[0] > max(before) + 1, (
                "expired entry was served from cache — no Spark job ran"
            )
            assert again == first
        finally:
            server.shutdown()

    def test_distinct_windows_do_not_collide(self, served, spark):
        server, port = start_monitor_server(
            spark,
            served["preds"],
            stops=served["stops"],
            trip_max_sequences=served["max_seq"],
            materialize_ttl=3600.0,
        )
        try:
            _, wide = _get(port, self._board_path())
            narrow_q = "/departures?" + urllib.parse.urlencode(
                {
                    "stop_ids": ",".join(f"s{i}" for i in range(16)),
                    "start": "2024-01-01T08:00:00",
                    "end": "2024-01-02T10:00:00",
                }
            )
            _, narrow = _get(port, narrow_q)
        finally:
            server.shutdown()
        assert narrow != wide  # different key → different board


class TestSingleFlight:
    """Cache-miss stampede hardening: N concurrent first-requests for one
    (stop-set, window) must run ONE Spark query (round-6 advice item)."""

    WINDOW = {"start": "2024-01-01T08:00:00", "end": "2024-01-06T10:00:00"}

    def _board_path(self, start=None, end=None):
        return "/departures?" + urllib.parse.urlencode(
            {
                "stop_ids": ",".join(f"s{i}" for i in range(16)),
                "start": start or self.WINDOW["start"],
                "end": end or self.WINDOW["end"],
            }
        )

    def _server(self, served, spark, **kw):
        return start_monitor_server(
            spark,
            served["preds"],
            stops=served["stops"],
            trip_max_sequences=served["max_seq"],
            materialize_ttl=3600.0,
            **kw,
        )

    def test_concurrent_misses_run_one_board_query(
        self, served, spark, monkeypatch
    ):
        import threading

        import dystonse_gtfs_data_spark.operators.monitor as mon

        orig = mon.departure_board
        calls = []
        monkeypatch.setattr(
            mon,
            "departure_board",
            lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
        )
        server, port = self._server(served, spark)
        try:
            results, errors = [], []

            def worker():
                try:
                    results.append(_get(port, self._board_path()))
                except Exception as exc:  # pragma: no cover - fail loud
                    errors.append(exc)

            threads = [threading.Thread(target=worker) for _ in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=300)
        finally:
            server.shutdown()
        assert not errors
        assert len(calls) == 1, f"stampede: {len(calls)} board queries ran"
        first = results[0][1]
        assert len(first) > 0
        assert all(status == 200 and rows == first for status, rows in results)

    def test_owner_failure_does_not_wedge_the_key(self, served, spark):
        # if the computing request raises, the key must be released so a
        # retry can become the new owner instead of waiting forever
        server, _port = self._server(served, spark)
        try:
            cls = server.RequestHandlerClass
            h = cls.__new__(cls)  # methods use class-level shared state only
            key = ("wedge-test",)

            def boom():
                raise RuntimeError("transient")

            with pytest.raises(RuntimeError):
                h._board_single_flight(key, boom)
            assert h._board_single_flight(key, lambda: [{"ok": 1}]) == [
                {"ok": 1}
            ]
        finally:
            server.shutdown()

    def test_equivalent_timestamp_spellings_share_one_entry(
        self, served, spark
    ):
        # "T" vs space spellings parse to the same datetimes and must hit
        # the same cache entry — proven by the job-id fence: the respelled
        # GET issues zero Spark jobs
        server, port = self._server(served, spark)
        try:
            status, first = _get(port, self._board_path())
            assert status == 200 and len(first) > 0
            sc = spark.sparkContext
            sc.setJobGroup("mhc-spell", "job-count fence")
            try:
                sc.parallelize([0]).count()
                before = _group_job_ids(spark, "mhc-spell", at_least=1)
                status, respelled = _get(
                    port,
                    self._board_path(
                        start="2024-01-01 08:00:00", end="2024-01-06 10:00:00"
                    ),
                )
                sc.parallelize([0]).count()
                after = _group_job_ids(
                    spark, "mhc-spell", at_least=len(before) + 1
                )
            finally:
                sc.setJobGroup(None, None)
            new = sorted(after - before)
            assert len(new) == 1 and new[0] == max(before) + 1, (
                "respelled window missed the cache and ran Spark jobs"
            )
            assert status == 200 and respelled == first
        finally:
            server.shutdown()


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *args, **kwargs):
        return None
