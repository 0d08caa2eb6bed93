"""Presentational sinks re-expressed as data operators (S11 / C18).

The reference renders delay curves three ways (SURVEY S11/C18):

- a 1×W RGBA PNG "heat strip" per prediction curve, base64 data-URL
  (src/monitor/mod.rs:1214-1262, ``generate_png_data_url``);
- SVG curve plots (src/analyser/curve_visualisation.rs:381-463, via
  gnuplot);
- PNG visual schedules (src/analyser/visual_schedule.rs:425-546, via
  plotters — the data side lives in operators/visual_schedule.py).

Those crates aren't available here, and on a 1000-executor cluster the
expensive part is the per-pixel MATH, not the byte packaging — so the
split is:

- **pixel/coordinate math is relational** (JVM-side expressions over
  the stored ECDF knots; see ``heat_strip_pixels`` /
  ``curve_svg_paths`` below and the hash-checked DuckDB twins in
  queries.py) — distributed, pushdown-friendly, no Python in the
  hot path;
- **byte packaging is a thin vectorized tail**: a dependency-free
  stdlib-zlib PNG encoder (the PNG spec is public) applied per row via
  a pandas UDF, and SVG path strings assembled with ``concat`` /
  ``array_join`` entirely JVM-side.

Gradient: the reference colors pixels with colorous'
YELLOW_ORANGE_BROWN / YELLOW_GREEN_BLUE — the public ColorBrewer
YlOrBr / YlGnBu 9-class sequential palettes.  colorous interpolates
with a spline basis; we use piecewise-linear interpolation between the
same nine control points (documented deviation: identical at the nine
anchors, ≤2/255 off between them, and expressible in portable SQL so
the DuckDB oracle reproduces it bit-for-bit).
"""

from __future__ import annotations

import base64
import struct
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..functions.lits import lit_doubles

# ColorBrewer 9-class sequential palettes (public; © Cynthia Brewer,
# Apache-licensed color specs — values, not code).  Reference usage:
# src/monitor/mod.rs:1216-1219 (Arrival → YlOrBr, Departure → YlGnBu).
YLORBR = [
    (255, 255, 229), (255, 247, 188), (254, 227, 145), (254, 196, 79),
    (254, 153, 41), (236, 112, 20), (204, 76, 2), (153, 52, 4), (102, 37, 6),
]
YLGNBU = [
    (255, 255, 217), (237, 248, 177), (199, 233, 180), (127, 205, 187),
    (65, 182, 196), (29, 145, 192), (34, 94, 168), (37, 52, 148), (8, 29, 88),
]

# Reference constants (src/monitor/mod.rs:1229-1246)
_CROP_BOTTOM = 0.2
_CROP_TOP = 0.2
_MIN_MAX_UNCUM = 0.05


def gradient_eval(palette: list[tuple[int, int, int]], t: float) -> tuple[int, int, int]:
    """Piecewise-linear eval of a 9-anchor palette at t ∈ [0, 1].

    floor(x + 0.5) rounding — the one rounding rule that Spark SQL and
    DuckDB share exactly (both ``round()`` builtins differ on halves).
    """
    t = min(max(t, 0.0), 1.0)
    t8 = t * 8.0
    k = min(int(t8), 7)
    frac = t8 - k
    c0, c1 = palette[k], palette[k + 1]
    return tuple(int(c0[i] + (c1[i] - c0[i]) * frac + 0.5) for i in range(3))


def heat_strip_colors(
    cum: list[float], width: int, palette: list[tuple[int, int, int]]
) -> list[tuple[int, int, int]]:
    """Reference pixel rule (src/monitor/mod.rs:1233-1258): ``cum`` is
    the CDF sampled at ``width + 1`` evenly spaced points; pixel i is
    colored from the normalized probability mass in [i, i+1), cropped
    into [0.2, 0.8] of the gradient; near-flat tails get the gradient
    floor; fully-outside pixels are white."""
    if len(cum) != width + 1:
        raise ValueError(f"need {width + 1} samples, got {len(cum)}")
    uncum = [cum[i + 1] - cum[i] for i in range(width)]
    mx = max(max(uncum), _MIN_MAX_UNCUM)
    out = []
    for i in range(width):
        pc = cum[i]
        if 0.01 < pc < 0.99:
            norm = uncum[i] / mx
            out.append(
                gradient_eval(
                    palette, _CROP_BOTTOM + norm * (1.0 - _CROP_BOTTOM - _CROP_TOP)
                )
            )
        elif 0.0 < pc < 1.0:
            out.append(gradient_eval(palette, 0.0))
        else:
            out.append((255, 255, 255))
    return out


# ---------------------------------------------------------------------------
# PNG packaging — dependency-free encoder for 8-bit RGBA (PNG spec is
# public: signature + IHDR + IDAT(zlib, filter 0) + IEND).  Deterministic
# for a given zlib: fixed compression level, no timestamps.
# ---------------------------------------------------------------------------


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png_rgba(raw: bytes, width: int, height: int) -> bytes:
    """Encode width×height RGBA pixels (row-major, 4 bytes/px) as PNG."""
    if len(raw) != width * height * 4:
        raise ValueError(f"expected {width * height * 4} bytes, got {len(raw)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    stride = width * 4
    scanlines = b"".join(
        b"\x00" + raw[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines, 9))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgba(png: bytes) -> tuple[bytes, int, int]:
    """Minimal inverse for tests: returns (raw RGBA, width, height).
    Only handles what encode_png_rgba emits (8-bit RGBA, filter 0)."""
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, width, height = 8, b"", 0, 0
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        typ = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            if (depth, color) != (8, 6):
                raise ValueError("decoder only handles 8-bit RGBA")
        elif typ == b"IDAT":
            idat += data
        pos += 12 + length
    scan = zlib.decompress(idat)
    stride = width * 4
    rows = []
    for y in range(height):
        line = scan[y * (stride + 1) : (y + 1) * (stride + 1)]
        if line[0] != 0:
            raise ValueError("decoder only handles filter 0")
        rows.append(line[1:])
    return b"".join(rows), width, height


def png_data_url(colors: list[tuple[int, int, int]]) -> str:
    """1×W heat strip → ``data:image/png;base64,...`` (reference
    src/monitor/mod.rs:1260-1261)."""
    raw = b"".join(bytes((r, g, b, 255)) for r, g, b in colors)
    return "data:image/png;base64," + base64.b64encode(
        encode_png_rgba(raw, len(colors), 1)
    ).decode("ascii")


# ---------------------------------------------------------------------------
# Relational pixel math (the distributed part)
# ---------------------------------------------------------------------------


def _grad_channel(palette: list[tuple[int, int, int]], ch: int, t: Column) -> Column:
    """JVM-side piecewise-linear palette eval for one channel: mirrors
    gradient_eval exactly (element_at is 1-based)."""
    # one F.expr parse, not 9 per-element F.lit round trips — the
    # function is instantiated 12× per strip (3 channels × 2 palettes ×
    # 2 crop branches), so the chatter multiplies (functions/lits.py)
    arr = lit_doubles([float(c[ch]) for c in palette])
    t8 = F.least(F.greatest(t, F.lit(0.0)), F.lit(1.0)) * 8.0
    k = F.least(F.floor(t8).cast("int"), F.lit(7))
    frac = t8 - k
    c0 = F.element_at(arr, k + 1)
    c1 = F.element_at(arr, k + 2)
    return F.floor(c0 + (c1 - c0) * frac + F.lit(0.5)).cast("bigint")


def heat_strip_pixels(
    knots: DataFrame,
    width: int,
    group_col: str = "event_type",
    palette_col: Column | None = None,
) -> DataFrame:
    """C18 pixel math, fully relational: stored ECDF knots
    (group, x, y) → one row per (group, px) with the reference's color
    rule applied JVM-side.

    Scale shape: the sample grid is ``width + 1`` rows per group
    (explode of a literal sequence — bounded), evaluated against the
    knot segments with a range join on the group key; every expression
    is whole-stage-codegen-able, no Python.  At 100 TB the knot set per
    group is already capped upstream (_CAPPED_KNOTS_SQL), so the join
    fan-out is O(groups × width).

    ``palette_col``: boolean column (truthy → YlOrBr "arrival" strip,
    else YlGnBu), defaults to an even-length group key — deterministic
    stand-in for the reference's EventType switch
    (src/monitor/mod.rs:1217-1219).
    """
    g = F.col(group_col)
    # the knot set is cap-bounded (O(groups × _CURVE_KNOT_CAP) rows) but its
    # LINEAGE is the full windowed ECDF over the fact table — persist so the
    # three consumers below (bounds, grid, segs) scan it once, not three times
    knots = tracked_persist(knots)
    bounds = knots.groupBy(group_col).agg(
        F.min("x").alias("min_x"), F.max("x").alias("max_x")
    )
    # sample grid: t_i = min_x + (max_x - min_x) * i / width, i = 0..width
    grid = bounds.select(
        g,
        "min_x",
        "max_x",
        F.explode(F.sequence(F.lit(0), F.lit(width))).alias("i"),
    ).withColumn(
        "t", F.col("min_x") + (F.col("max_x") - F.col("min_x")) * F.col("i") / width
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("x")
    segs = knots.select(
        g,
        F.col("x").alias("x0"),
        F.col("y").alias("y0"),
        F.lead("x").over(w).alias("x1"),
        F.lead("y").over(w).alias("y1"),
    ).filter(F.col("x1").isNotNull())
    # y_at_x with CDF clamp (np.interp left=0 right=1; reference
    # typed_y_at_x clamps the same way, src/monitor/time_curve.rs)
    inside = grid.alias("p").join(
        segs.alias("s"),
        (F.col(f"p.{group_col}") == F.col(f"s.{group_col}"))
        & (F.col("s.x0") <= F.col("p.t"))
        & (F.col("p.t") < F.col("s.x1")),
    ).select(
        F.col(f"p.{group_col}").alias(group_col),
        "p.i",
        (
            (F.col("s.y1") - F.col("s.y0"))
            / (F.col("s.x1") - F.col("s.x0"))
            * (F.col("p.t") - F.col("s.x0"))
            + F.col("s.y0")
        ).alias("cum"),
    )
    outside = grid.filter(F.col("t") >= F.col("max_x")).select(
        g, "i", F.lit(1.0).alias("cum")
    )
    cum = inside.unionByName(outside)

    wp = Window.partitionBy(group_col).orderBy("i")
    wg = Window.partitionBy(group_col)
    px = (
        cum.withColumn("uncum", F.lead("cum").over(wp) - F.col("cum"))
        .filter(F.col("uncum").isNotNull())  # drops i = width (the fence)
        .withColumn(
            "norm",
            F.col("uncum") / F.greatest(F.max("uncum").over(wg), F.lit(_MIN_MAX_UNCUM)),
        )
    )
    if palette_col is None:
        palette_col = F.length(g) % 2 == 0
    t_grad = F.lit(_CROP_BOTTOM) + F.col("norm") * (
        1.0 - _CROP_BOTTOM - _CROP_TOP
    )
    out_cols = []
    for ch, name in enumerate(("r", "g", "b")):
        grad = F.when(
            (F.col("cum") > 0.01) & (F.col("cum") < 0.99),
            F.when(palette_col, _grad_channel(YLORBR, ch, t_grad)).otherwise(
                _grad_channel(YLGNBU, ch, t_grad)
            ),
        ).when(
            (F.col("cum") > 0.0) & (F.col("cum") < 1.0),
            F.when(
                palette_col, _grad_channel(YLORBR, ch, F.lit(0.0))
            ).otherwise(_grad_channel(YLGNBU, ch, F.lit(0.0))),
        ).otherwise(F.lit(255).cast("bigint"))
        out_cols.append(grad.alias(name))
    return px.select(
        g, F.col("i").cast("bigint").alias("px"), F.round("cum", 9).alias("cum"), *out_cols
    )


def heat_strip_data_urls(pixels: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Byte-packaging tail: (group, px, r, g, b) → (group, data_url).

    Arrow-batched pandas UDF over per-group pixel arrays; the arrays are
    width-bounded (64 px) so the per-row payload is O(width), never
    O(data)."""
    strips = pixels.groupBy(group_col).agg(
        F.sort_array(F.collect_list(F.struct("px", "r", "g", "b"))).alias("pxs")
    )

    @F.pandas_udf("string")
    def _encode(pxs: pd.Series) -> pd.Series:
        return pxs.map(
            lambda rows: png_data_url(
                [(int(p["r"]), int(p["g"]), int(p["b"])) for p in rows]
            )
        )

    return strips.select(group_col, _encode("pxs").alias("data_url"))


# ---------------------------------------------------------------------------
# SVG curve plots (S11) — coordinate math and string assembly both
# JVM-side; the output is a complete SVG document per group.
# ---------------------------------------------------------------------------


def curve_svg_paths(
    knots: DataFrame,
    width: int = 400,
    height: int = 100,
    group_col: str = "event_type",
) -> DataFrame:
    """S11 curve plot (src/analyser/curve_visualisation.rs:381-463 —
    gnuplot there; a self-contained SVG path here): each group's ECDF
    knots scaled into a width×height viewport, y flipped (SVG origin is
    top-left), emitted as one ``<svg><path d="M x,y L x,y ..."/></svg>``
    string per group.

    Integer pixel coordinates via floor(v + 0.5) keep the string
    dialect-portable (the DuckDB twin reproduces it exactly).  The
    whole computation — scaling, sorting, string assembly — is
    ``concat``/``array_join`` JVM expressions; no Python, one shuffle
    (the groupBy), knot count capped upstream."""
    g = F.col(group_col)
    knots = tracked_persist(knots)  # same cap-bounded reuse as heat_strip_pixels
    wg = F.min("x").alias("min_x"), F.max("x").alias("max_x")
    bounds = knots.groupBy(group_col).agg(*wg)
    scaled = knots.join(bounds, group_col).select(
        g,
        F.col("x"),
        F.floor(
            F.when(
                F.col("max_x") > F.col("min_x"),
                (F.col("x") - F.col("min_x"))
                / (F.col("max_x") - F.col("min_x"))
                * width,
            ).otherwise(F.lit(0.0))
            + 0.5
        )
        .cast("bigint")
        .alias("px"),
        F.floor((F.lit(1.0) - F.col("y")) * height + 0.5).cast("bigint").alias("py"),
    )
    pts = scaled.groupBy(group_col).agg(
        F.count("*").alias("n_points"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("x", "px", "py"))),
                lambda p: F.concat_ws(",", p["px"].cast("string"), p["py"].cast("string")),
            ),
            " L ",
        ).alias("d_tail"),
    )
    svg = F.concat(
        F.lit(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}">'
            '<path fill="none" stroke="black" d="M '
        ),
        F.col("d_tail"),
        F.lit('"/></svg>'),
    )
    return pts.select(g, "n_points", svg.alias("svg"))
