"""S10 compact curve codec — bounded-size binary serialization of stored
ECDF/CDF curves.

The reference stores prediction curves through
``curve.serialize_compact_limited(120)``
(src/importer/per_schedule_importer.rs:362,
src/importer/scheduled_predictions_importer.rs:296) and reads them back with
``deserialize_compact`` (src/monitor/mod.rs:1495).  The byte layout lives in
the external ``dystonse-curves`` crate (not vendored in the reference tree),
so this module defines its OWN documented format with the same contract:

* at most ``limit`` knots survive serialization (stride subsample that always
  keeps the first and last knot — the same deterministic rank-stride rule the
  relational knot cap uses, so a SQL oracle can reproduce the subset);
* y is quantized to one byte (1/255 steps — CDF y is in [0, 1] by
  construction);
* x stays float32 (delays in seconds need sub-second resolution over a
  ±3600 s span; one byte would not do).

Layout (little-endian): ``u16 n`` then ``n x f32 x`` then ``n x u8 y_q``
with ``y_q = floor(y * 255 + 0.5)`` — floor(+0.5) instead of round() so the
Python, Spark, and DuckDB reimplementations agree on exact .5 ties
(numpy ``round`` is banker's, SQL ``round`` is half-away-from-zero).

Size bound: ``2 + 5 * limit`` bytes (602 for the reference's limit of 120),
versus ~16 bytes/knot for the unpacked ``array<struct<x:double,y:double>>``
representation — the storage win that matters when 100 TB of records roll up
into billions of stored curves.
"""

from __future__ import annotations

import math
import struct

import numpy as np

COMPACT_LIMIT = 120  # the reference's serialize_compact_limited(120) bound


def cap_stride(n: int, limit: int = COMPACT_LIMIT) -> int:
    """Rank stride used by the subsample: ceil(n / limit), >= 1."""
    return max(1, (n + limit - 1) // limit)


def cap_indices(n: int, limit: int = COMPACT_LIMIT) -> np.ndarray:
    """0-based indices of the knots that survive the cap: every ``stride``-th
    knot by rank, plus always the last.  Identical to the relational rule
    ``krn = 1 OR krn = knd OR (krn - 1) % stride = 0`` used by the SQL
    oracles (queries.py knot cap)."""
    stride = cap_stride(n, limit)
    keep = np.arange(0, n, stride)
    if n and keep[-1] != n - 1:
        keep = np.append(keep, n - 1)
    return keep


def quantize_y(y: np.ndarray) -> np.ndarray:
    """u8 quantization with portable tie-breaking: floor(y * 255 + 0.5)."""
    return np.floor(np.asarray(y, dtype=np.float64) * 255.0 + 0.5).astype(
        np.uint8
    )


def encode_compact(
    xs: np.ndarray, ys: np.ndarray, limit: int = COMPACT_LIMIT
) -> bytes:
    """Serialize a sorted knot list to the compact layout (<= 2+5*limit B)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if xs.shape != ys.shape or xs.ndim != 1:
        raise ValueError("xs/ys must be equal-length 1-D arrays")
    keep = cap_indices(len(xs), limit)
    xk = xs[keep].astype(np.float32)
    yk = quantize_y(ys[keep])
    n = len(keep)
    if n > 0xFFFF:
        raise ValueError(f"knot count {n} exceeds u16 header")
    return struct.pack("<H", n) + xk.tobytes() + yk.tobytes()


def decode_compact(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_compact`: (x float32 array, y_q uint8 array).

    Callers wanting the float CDF value divide y_q by 255 themselves; the
    codec exposes the exact stored integers so equality checks stay exact.
    """
    (n,) = struct.unpack_from("<H", blob, 0)
    expected = 2 + 5 * n
    if len(blob) != expected:
        raise ValueError(f"blob length {len(blob)} != {expected} for n={n}")
    xs = np.frombuffer(blob, dtype="<f4", count=n, offset=2)
    ys = np.frombuffer(blob, dtype=np.uint8, count=n, offset=2 + 4 * n)
    return xs, ys
