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


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, *args, **kwargs):
        return None
