"""C6 duration parse, C8 percent-encoding, and the S10 compact curve codec.

The percent-encoding pair is checked against a tiny pure-Python byte-wise
reference (the percent-encoding crate's contract: AsciiSet governs ASCII
bytes, non-ASCII bytes are always escaped), and the codec against handmade
arrays including the >limit cap path.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dystonse_gtfs_data_spark.curves.codec import (
    cap_indices,
    decode_compact,
    encode_compact,
    quantize_y,
)
from dystonse_gtfs_data_spark.functions import text as Ft

# --------------------------------------------------------------------------
# pure-Python reference for PATH_ELEMENT_ESCAPE percent-encoding
# --------------------------------------------------------------------------

_ESCAPED_ASCII = {0x7F, ord("/"), ord("?"), ord('"'), ord("`")}


def _py_percent_encode(s: str) -> str:
    out = []
    for b in s.encode("utf-8"):
        if b < 0x20 or b >= 0x80 or b in _ESCAPED_ASCII:
            out.append(f"%{b:02X}")
        else:
            out.append(chr(b))
    return "".join(out)


def _spark_eval(spark, col, values: list[str], dtype: str = "string"):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[0] for r in df.select(col(F.col("s")).alias("o")).collect()]


PERCENT_SAMPLES = [
    "",
    "plain",
    "a/b?c",
    'quote" back` slash/',
    "Grüße aus München",
    "tab\there nl\nthere",
    "ü",
    "%already",
    "日本語/パス?",
    "mixed ü/?: end`",
]


def test_percent_encode_matches_python_reference(spark):
    got = _spark_eval(spark, Ft.percent_encode_path, PERCENT_SAMPLES)
    assert got == [_py_percent_encode(s) for s in PERCENT_SAMPLES]


def test_percent_decode_roundtrips(spark):
    encoded = [_py_percent_encode(s) for s in PERCENT_SAMPLES]
    got = _spark_eval(spark, Ft.percent_decode_path, encoded)
    assert got == PERCENT_SAMPLES


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFF
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_percent_encode_property(spark_global, strings):
    got = _spark_eval(spark_global, Ft.percent_encode_path, strings)
    assert got == [_py_percent_encode(s) for s in strings]
    back = _spark_eval(spark_global, Ft.percent_decode_path, got)
    assert back == strings


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


# --------------------------------------------------------------------------
# C6 duration parsing
# --------------------------------------------------------------------------

DUR_CASES = {
    "1h 30min": (3600 + 30 * 60) * 1_000_000,
    "90m": 90 * 60 * 1_000_000,
    "2d4h": (2 * 86400 + 4 * 3600) * 1_000_000,
    "300": 300 * 1_000_000,
    "1w": 7 * 86400 * 1_000_000,
    "250ms 50us": 250_000 + 50,
    "0s": 0,
    "5S": 5 * 1_000_000,  # case-insensitive
    "1h30m15s": (3600 + 30 * 60 + 15) * 1_000_000,
    "nonsense": None,  # no digit term at all
    "5 parsecs": None,  # unknown unit poisons the sum
}


def test_parse_duration_cases(spark):
    got = _spark_eval(
        spark, Ft.parse_duration_us, list(DUR_CASES.keys())
    )
    assert got == list(DUR_CASES.values())


# --------------------------------------------------------------------------
# S10 compact codec
# --------------------------------------------------------------------------


def test_codec_roundtrip_small():
    xs = np.array([-120.0, -30.5, 0.0, 45.25, 3000.0])
    ys = np.array([0.0, 0.2, 0.5, 0.9, 1.0])
    blob = encode_compact(xs, ys)
    assert len(blob) == 2 + 5 * 5
    dx, dy = decode_compact(blob)
    np.testing.assert_array_equal(dx, xs.astype(np.float32))
    np.testing.assert_array_equal(dy, quantize_y(ys))


def test_codec_caps_to_limit_keeping_endpoints():
    n = 1000
    xs = np.linspace(-3600, 3600, n)
    ys = np.linspace(0, 1, n)
    blob = encode_compact(xs, ys, limit=120)
    dx, dy = decode_compact(blob)
    assert len(dx) <= 121  # stride subsample + forced last knot
    assert len(blob) <= 2 + 5 * 121
    assert dx[0] == np.float32(xs[0]) and dx[-1] == np.float32(xs[-1])
    assert dy[0] == 0 and dy[-1] == 255
    # monotone non-decreasing y survives quantization
    assert (np.diff(dy.astype(int)) >= 0).all()


def test_cap_indices_matches_sql_rule():
    # the SQL rule: krn = 1 OR krn = knd OR (krn - 1) % stride = 0
    for n in (1, 2, 5, 119, 120, 121, 240, 241, 999):
        stride = max(1, math.ceil(n / 120))
        expect = sorted(
            {
                i
                for i in range(n)
                if i == 0 or i == n - 1 or i % stride == 0
            }
        )
        assert list(cap_indices(n, 120)) == expect


def test_codec_idempotent_after_roundtrip():
    rng = np.random.default_rng(7)
    xs = np.sort(rng.uniform(-3600, 3600, 400))
    ys = np.sort(rng.uniform(0, 1, 400))
    b1 = encode_compact(xs, ys, limit=120)
    dx, dy = decode_compact(b1)
    # re-encoding the decoded knots must be byte-identical (y_q/255 is
    # exactly representable, floor(q/255*255+0.5) == q for all u8 q)
    b2 = encode_compact(dx.astype(np.float64), dy / 255.0, limit=120)
    assert b1 == b2


def test_codec_rejects_malformed():
    with pytest.raises(ValueError):
        decode_compact(b"\x05\x00short")
    with pytest.raises(ValueError):
        encode_compact(np.array([1.0, 2.0]), np.array([0.5]))
