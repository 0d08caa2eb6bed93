"""S11/C18/S12 presentational-sink tests: PNG container goldens,
gradient anchors, heat-strip pixel rules, SVG assembly, and the
rate-limited ping (reference semantics: src/monitor/mod.rs:1214-1262,
src/analyser/curve_visualisation.rs:381-463, src/importer/mod.rs:266-292).
"""

from __future__ import annotations

import base64
import threading
import zlib

import pytest
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.operators.render import (
    YLGNBU,
    YLORBR,
    curve_svg_paths,
    decode_png_rgba,
    encode_png_rgba,
    gradient_eval,
    heat_strip_colors,
    heat_strip_data_urls,
    heat_strip_pixels,
    png_data_url,
)
from dystonse_gtfs_data_spark.sources.ping import RateLimitedPing


# ---------------------------------------------------------------------------
# PNG container
# ---------------------------------------------------------------------------


def test_png_roundtrip():
    raw = bytes(range(2 * 3 * 4))  # 2x3 RGBA
    png = encode_png_rgba(raw, 2, 3)
    back, w, h = decode_png_rgba(png)
    assert (back, w, h) == (raw, 2, 3)


def test_png_golden_bytes():
    # one red + one semi-transparent blue pixel; pinned so any encoder
    # drift (chunk order, compression level, filter byte) is loud
    png = encode_png_rgba(bytes([255, 0, 0, 255, 0, 0, 255, 128]), 2, 1)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    # IHDR payload: width=2, height=1, depth=8, color=6 (RGBA)
    assert png[16:29] == bytes.fromhex("00000002000000010806000000")
    assert b"IDAT" in png and png.endswith(
        bytes.fromhex("0000000049454e44ae426082")  # empty IEND + its CRC
    )
    # stable overall: zlib level 9 output is deterministic for a given input
    assert base64.b64encode(png).decode() == base64.b64encode(
        encode_png_rgba(bytes([255, 0, 0, 255, 0, 0, 255, 128]), 2, 1)
    ).decode()


def test_png_crc_valid():
    png = encode_png_rgba(b"\x00" * 4, 1, 1)
    # walk chunks and verify each CRC
    pos = 8
    seen = []
    while pos < len(png):
        length = int.from_bytes(png[pos : pos + 4], "big")
        typ = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        crc = int.from_bytes(png[pos + 8 + length : pos + 12 + length], "big")
        assert crc == zlib.crc32(typ + data) & 0xFFFFFFFF, typ
        seen.append(typ)
        pos += 12 + length
    assert seen == [b"IHDR", b"IDAT", b"IEND"]


def test_png_data_url_prefix():
    url = png_data_url([(1, 2, 3), (4, 5, 6)])
    assert url.startswith("data:image/png;base64,")
    raw, w, h = decode_png_rgba(base64.b64decode(url.split(",", 1)[1]))
    assert (w, h) == (2, 1)
    assert raw == bytes([1, 2, 3, 255, 4, 5, 6, 255])


# ---------------------------------------------------------------------------
# gradient + pixel rules
# ---------------------------------------------------------------------------


def test_gradient_anchors_exact():
    # at the nine anchors the piecewise-linear eval must return the
    # ColorBrewer control colors exactly (colorous agrees at anchors too)
    for pal in (YLORBR, YLGNBU):
        for k in range(9):
            assert gradient_eval(pal, k / 8.0) == pal[k]


def test_gradient_midpoint_and_clamp():
    mid = gradient_eval(YLORBR, 1 / 16.0)  # halfway anchor0→anchor1
    assert mid == tuple(
        int(a + (b - a) * 0.5 + 0.5) for a, b in zip(YLORBR[0], YLORBR[1])
    )
    assert gradient_eval(YLORBR, -1.0) == YLORBR[0]
    assert gradient_eval(YLORBR, 2.0) == YLORBR[8]


def test_heat_strip_rules():
    # 4-px strip over a CDF that is 0 for the first pixel, ramps to 1
    cum = [0.0, 0.0, 0.5, 1.0, 1.0]
    cols = heat_strip_colors(cum, 4, YLORBR)
    assert cols[0] == (255, 255, 255)  # cum = 0 → white
    # pixel 1: cum = 0 → white per the outer rule? no: pc == 0.0 → white
    assert cols[1] == (255, 255, 255)
    # pixel 2: pc = 0.5 in (0.01, 0.99) → graded, mass 0.5 == max → t = 0.8
    assert cols[2] == gradient_eval(YLORBR, 0.8)
    # pixel 3: pc = 1.0 → white
    assert cols[3] == (255, 255, 255)


def test_heat_strip_near_flat_floor():
    # mass everywhere below 0.05 → normalizer clamps at 0.05; a pixel with
    # 0 < pc < 0.01 gets the gradient floor color
    cum = [0.0, 0.005, 0.02, 0.03, 0.04]
    cols = heat_strip_colors(cum, 4, YLGNBU)
    assert cols[0] == (255, 255, 255)  # pc = 0
    assert cols[1] == gradient_eval(YLGNBU, 0.0)  # 0 < 0.005 < 0.01 → floor
    t = 0.2 + (0.01 / 0.05) * 0.6
    assert cols[2] == gradient_eval(YLGNBU, t)


# ---------------------------------------------------------------------------
# Spark plumbing: relational pixels == pure-python rule; UDF packaging
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def knots_df(spark):
    pts = [
        ("a", [(0.0, 0.0), (10.0, 0.25), (20.0, 0.75), (40.0, 1.0)]),
        ("bb", [(-5.0, 0.0), (0.0, 0.5), (5.0, 1.0)]),
    ]
    rows = [(g, x, y) for g, curve in pts for x, y in curve]
    return spark.createDataFrame(rows, "event_type string, x double, y double")


def test_relational_pixels_match_reference_rule(spark, knots_df):
    width = 16
    out = heat_strip_pixels(knots_df, width=width).toPandas()
    for grp, pal in (("a", YLGNBU), ("bb", YLORBR)):  # len odd → YlGnBu
        sub = out[out.event_type == grp].sort_values("px")
        assert list(sub.px) == list(range(width))
        # recompute with the pure-python rule on the same sample grid
        import numpy as np

        xs = [p for p in knots_df.toPandas().query(f"event_type == '{grp}'").x]
        ys = [p for p in knots_df.toPandas().query(f"event_type == '{grp}'").y]
        lo, hi = min(xs), max(xs)
        cum = [
            float(np.interp(lo + (hi - lo) * i / width, xs, ys))
            for i in range(width + 1)
        ]
        expect = heat_strip_colors(cum, width, pal)
        got = list(zip(sub.r, sub.g, sub.b))
        assert got == expect, grp


def test_data_url_udf_roundtrip(spark, knots_df):
    px = heat_strip_pixels(knots_df, width=8)
    urls = {
        r["event_type"]: r["data_url"]
        for r in heat_strip_data_urls(px).collect()
    }
    assert set(urls) == {"a", "bb"}
    pdf = px.toPandas()
    for grp, url in urls.items():
        raw, w, h = decode_png_rgba(base64.b64decode(url.split(",", 1)[1]))
        assert (w, h) == (8, 1)
        sub = pdf[pdf.event_type == grp].sort_values("px")
        expect = b"".join(
            bytes((int(r), int(g), int(b), 255))
            for r, g, b in zip(sub.r, sub.g, sub.b)
        )
        assert raw == expect


def test_svg_assembly(spark, knots_df):
    out = {
        r["event_type"]: r
        for r in curve_svg_paths(knots_df, width=100, height=50).collect()
    }
    assert out["bb"]["n_points"] == 3
    svg = out["bb"]["svg"]
    assert svg.startswith('<svg xmlns="http://www.w3.org/2000/svg"')
    # knots (-5,0) (0,.5) (5,1) → px 0/50/100, py (flipped) 50/25/0
    assert 'd="M 0,50 L 50,25 L 100,0"' in svg
    assert svg.endswith("/></svg>")


def test_heat_strip_plan_no_python(spark, knots_df):
    # the pixel math must stay JVM-side: no Python eval nodes in the plan
    plan = heat_strip_pixels(knots_df, width=8)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# S12 ping
# ---------------------------------------------------------------------------


def test_ping_rate_limit_and_thread_safety():
    clock = [0.0]
    calls = []

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n):
            return b""

    def opener(url, timeout):
        calls.append(url)
        return FakeResp()

    p = RateLimitedPing(
        "http://example.invalid/ping", min_interval_s=60, clock=lambda: clock[0],
        opener=opener,
    )
    # burst from several threads: exactly one attempt goes through
    threads = [threading.Thread(target=p.maybe_ping) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert len(calls) == 1
    assert p.maybe_ping() is False  # still inside the interval
    clock[0] = 61.0
    assert p.maybe_ping() is True
    assert len(calls) == 2


def test_ping_swallows_errors_and_none_url():
    def boom(url, timeout):
        raise OSError("connection refused")

    p = RateLimitedPing("http://example.invalid/x", clock=lambda: 0.0, opener=boom)
    assert p.maybe_ping() is True  # attempted, error swallowed
    assert RateLimitedPing(None).maybe_ping() is False


def test_ping_real_local_server():
    import http.server
    import socketserver

    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.handle_request)
        t.start()
        p = RateLimitedPing(f"http://127.0.0.1:{port}/alive", timeout_s=5)
        assert p.maybe_ping() is True
        t.join(timeout=10)
    assert hits == ["/alive"]


def test_ping_fires_from_streaming_pipeline(spark, tmp_path):
    """S12 integration: the automatic-mode stream pings after a batch
    (reference: ping after each import iteration)."""
    import http.server
    import socketserver

    from dystonse_gtfs_data_spark.sources.demo import build_rt_updates, build_schedule
    from dystonse_gtfs_data_spark.streaming.pipeline import start_records_stream

    hits = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    sched = build_schedule(spark)
    land = str(tmp_path / "landing")
    build_rt_updates(spark).write.parquet(land)

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        srv.timeout = 30
        port = srv.server_address[1]
        t = threading.Thread(target=srv.handle_request)
        t.start()
        q = start_records_stream(
            spark,
            land,
            sched["trips"],
            sched["stop_times"],
            source="stream",
            sink=lambda df, epoch: df.count(),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
            ping_url=f"http://127.0.0.1:{port}/alive",
        )
        q.awaitTermination(120)
        t.join(timeout=30)
    assert hits == ["/alive"]
