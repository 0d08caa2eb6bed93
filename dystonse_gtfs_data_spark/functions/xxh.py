"""Pure-Python xxHash64 (public algorithm, Yann Collet; spec at
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), matching
Spark's ``F.xxhash64`` on string columns (UTF-8 bytes, default seed 42,
result reinterpreted as SIGNED int64).

Exists so the single-node differential oracles can recompute the
xxhash-family minhash/simhash pipelines independently of Spark — the
md5-fold variants have pure-SQL twins; this closes the oracle gap for
the production hash path.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxhash64(data: bytes, seed: int = 42) -> int:
    """xxHash64 of ``data``; returns the SIGNED int64 Spark reports."""
    n = len(data)
    pos = 0

    def u64(i: int) -> int:
        return int.from_bytes(data[i : i + 8], "little")

    def u32(i: int) -> int:
        return int.from_bytes(data[i : i + 4], "little")

    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            v1 = _round(v1, u64(pos))
            v2 = _round(v2, u64(pos + 8))
            v3 = _round(v3, u64(pos + 16))
            v4 = _round(v4, u64(pos + 24))
            pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64

    h = (h + n) & _M64
    while pos + 8 <= n:
        h ^= _round(0, u64(pos))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        h ^= (u32(pos) * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1

    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    # Spark reports the value as a signed long
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_long(value: int, seed: int = 42) -> int:
    """``F.xxhash64(bigint_col)`` semantics: Spark hashes a LONG as its
    8 little-endian two's-complement bytes (verified value-for-value
    against the JVM in tests).  Used by the codebook-sampling replicas
    so 'order by xxhash64(id)' is reproducible off-Spark."""
    return xxhash64(value.to_bytes(8, "little", signed=True), seed)


def spark_abs_xxhash64(text: str, seed: int = 42) -> int:
    """``F.abs(F.xxhash64(col))`` semantics, including Java's
    ``Math.abs(Long.MIN_VALUE) == Long.MIN_VALUE`` edge."""
    v = xxhash64(text.encode("utf-8"), seed)
    if v == -(1 << 63):
        return v
    return abs(v)
