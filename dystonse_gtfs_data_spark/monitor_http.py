"""Thin HTTP shell over the monitor data paths.

The reference's monitor subcommand serves HTTP (src/monitor/mod.rs:
102-190): a search page, ``/autocomplete``, a ``/stop-by-name``
redirect, and per-stop departure pages.  This shell exposes the same
DATA endpoints as JSON over stdlib ``http.server`` — the HTML/static
layer is presentation the engine doesn't own, but the queries behind
each route are the exact operators the CLI ``monitor`` command runs
(operators/monitor.py), so a web frontend can sit directly on it.

Routes:
    GET /                → endpoint index (JSON)
    GET /autocomplete?q=term+term   → {"names": [...]}      (mod.rs:155)
    GET /stop-by-name?start=NAME    → 302 → /departures?... (mod.rs:157-170)
    GET /departures?stop_ids=a,b&start=...&end=...
                         → JSON array of departure-board rows (mod.rs:426-591)

Scale note: the server is a driver-side shell — each request runs a
Spark query whose heavy lifting (window overlap, dedup, median sort)
executes on the cluster; only the page-sized board rows are collected.

Serving shape under concurrency (SURVEY §3.3): per-request Spark
queries mirror the reference's per-request MySQL queries but serialize
on the driver.  ``materialize_ttl`` turns on a driver-side board cache:
the first request for a (stop-set, window) computes and collects the
board once, repeats within the TTL are served from memory with ZERO
Spark jobs (asserted by test), and entries expire after the TTL or
fall off an LRU cap — so a dashboard polling N stop pages costs one
cluster query per page per TTL, not per refresh.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
import time
import urllib.parse
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: driver-memory bound for the materialized-board cache: page-sized row
#: lists only, evicted least-recently-used past this many (stop-set,
#: window) keys
_BOARD_CACHE_MAX = 256


def _parse_dt(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s.replace("T", " "))


def board_rows_json(board: DataFrame) -> list[dict]:
    """Collect a departure-board frame into JSON-safe dicts — the same
    projection the ``departure_board`` catalog entry hash-checks
    (timestamps as unix micros, enums as ints)."""
    out = board.select(
        "stop_id",
        "stop_sequence",
        F.col("event_type").cast("int").alias("event_type"),
        "trip_id",
        F.col("trip_start_date").cast("string").alias("trip_start_date"),
        "trip_start_time",
        F.col("precision_type").cast("int").alias("precision_type"),
        F.col("origin_type").cast("int").alias("origin_type"),
        F.unix_micros("median_time").alias("median_time_us"),
    )
    return [row.asDict() for row in out.collect()]


class _MonitorHandler(BaseHTTPRequestHandler):
    # context injected by start_monitor_server via subclassing
    spark = None
    predictions: DataFrame | None = None
    stops: DataFrame | None = None
    trip_max_sequences: DataFrame | None = None
    # materialization state (shared per server via the subclass)
    materialize_ttl: float | None = None
    clock = staticmethod(time.monotonic)
    _board_cache: "OrderedDict[tuple, tuple[float, list[dict]]]" = None  # type: ignore[assignment]
    _cache_lock: threading.Lock = None  # type: ignore[assignment]
    _inflight: "dict[tuple, threading.Event]" = None  # type: ignore[assignment]

    def _cached_board(self, key: tuple) -> list[dict] | None:
        """Fresh cache hit or None.  LRU touch on hit."""
        with self._cache_lock:
            hit = self._board_cache.get(key)
            if hit is None:
                return None
            stamp, rows = hit
            if self.clock() - stamp >= self.materialize_ttl:
                del self._board_cache[key]
                return None
            self._board_cache.move_to_end(key)
            return rows

    def _store_board(self, key: tuple, rows: list[dict]) -> None:
        with self._cache_lock:
            self._board_cache[key] = (self.clock(), rows)
            self._board_cache.move_to_end(key)
            while len(self._board_cache) > _BOARD_CACHE_MAX:
                self._board_cache.popitem(last=False)

    def _board_single_flight(self, key: tuple, compute) -> list[dict]:
        """Cache lookup with per-key request coalescing: N concurrent
        misses on one (stop-set, window) run ONE Spark query — the first
        caller computes, the rest wait on a per-key Event and read the
        stored rows.  If the owner's compute raises, waiters re-race for
        ownership, so a transient failure doesn't wedge the key."""
        while True:
            rows = self._cached_board(key)
            if rows is not None:
                return rows
            with self._cache_lock:
                ev = self._inflight.get(key)
                owner = ev is None
                if owner:
                    ev = threading.Event()
                    self._inflight[key] = ev
            if owner:
                try:
                    rows = compute()
                    self._store_board(key, rows)
                finally:
                    with self._cache_lock:
                        self._inflight.pop(key, None)
                    ev.set()
                return rows
            ev.wait()
            # loop: fresh hit in the common case; on owner failure one
            # waiter becomes the new owner

    def log_message(self, fmt, *args):  # quiet under pytest
        pass

    def _send_json(self, payload, status: int = 200) -> None:
        body = json.dumps(payload, default=str).encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (stdlib naming)
        try:
            url = urllib.parse.urlsplit(self.path)
            params = dict(urllib.parse.parse_qsl(url.query))
            route = url.path.rstrip("/") or "/"
            if route == "/":
                self._send_json(
                    {"endpoints": ["/autocomplete", "/stop-by-name", "/departures"]}
                )
            elif route == "/autocomplete":
                from .operators.monitor import autocomplete_stops

                terms = params.get("q", "").split()
                names = autocomplete_stops(self.stops, terms).collect()
                self._send_json({"names": [r["stop_name"] for r in names]})
            elif route == "/stop-by-name":
                # the reference's form-POST shim (mod.rs:157-170): resolve
                # the typed NAME against the stops table and redirect to
                # the departures URL for its stop id(s); a value matching
                # no stop_name passes through unchanged (it may already BE
                # an id).  Optional start/end window params are carried
                # into the redirect so following it works.
                from pyspark.sql import functions as F

                name = params.get("start", "")
                ids = [name]
                if self.stops is not None:
                    hits = (
                        self.stops.filter(F.col("stop_name") == name)
                        .select("stop_id")
                        .collect()
                    )
                    if hits:
                        ids = sorted(r["stop_id"] for r in hits)
                q = {"stop_ids": ",".join(ids)}
                for key in ("start", "end"):
                    win = params.get(f"window_{key}")
                    if win:
                        q[key] = win
                loc = "/departures?" + urllib.parse.urlencode(q)
                self.send_response(302)
                self.send_header("Location", loc)
                self.end_headers()
            elif route == "/departures":
                from .operators.monitor import departure_board

                stop_ids = params["stop_ids"].split(",")
                window_min = _parse_dt(params["start"])
                window_max = _parse_dt(params["end"])

                def compute() -> list[dict]:
                    board = departure_board(
                        self.predictions,
                        stop_ids=stop_ids,
                        window_min=window_min,
                        window_max=window_max,
                        trip_max_sequences=self.trip_max_sequences,
                    )
                    return board_rows_json(board)

                if self.materialize_ttl is not None:
                    # key on the PARSED datetimes so equivalent spellings
                    # ("T" vs space, trailing seconds) share one entry
                    key = (tuple(sorted(stop_ids)), window_min, window_max)
                    rows = self._board_single_flight(key, compute)
                else:
                    rows = compute()
                self._send_json(rows)
            else:
                self._send_json({"error": f"unknown route {route}"}, status=404)
        except Exception as exc:  # the reference's generate_error_page
            self._send_json({"error": str(exc)}, status=500)


def start_monitor_server(
    spark,
    predictions: DataFrame,
    stops: DataFrame | None = None,
    trip_max_sequences: DataFrame | None = None,
    port: int = 0,
    materialize_ttl: float | None = None,
    clock=time.monotonic,
) -> tuple[ThreadingHTTPServer, int]:
    """Start the monitor HTTP server on ``port`` (0 = ephemeral) in a
    daemon thread; returns (server, bound_port).  Stop with
    ``server.shutdown()``.

    ``materialize_ttl`` (seconds) enables the pre-materialized board
    cache: repeats of a (stop-set, window) page within the TTL are
    served from driver memory without any Spark work; ``None`` keeps
    the reference's query-per-request behavior.  ``clock`` is
    injectable for TTL tests (monotonic seconds)."""
    handler = type(
        "BoundMonitorHandler",
        (_MonitorHandler,),
        {
            "spark": spark,
            "predictions": predictions,
            "stops": stops,
            "trip_max_sequences": trip_max_sequences,
            "materialize_ttl": materialize_ttl,
            "clock": staticmethod(clock),
            "_board_cache": OrderedDict(),
            "_cache_lock": threading.Lock(),
            "_inflight": {},
        },
    )
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, server.server_address[1]
