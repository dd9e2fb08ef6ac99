"""Pure-Python twin of Spark's ``xxhash64`` expression.

The staged engine derives its deterministic retry jitter from
``F.xxhash64(url, n, seed)`` (operators/crawler.py error-retry branch). The
fully-fused execution gear replays that wave loop in plain Python, so it
needs the *bit-exact* same hash — otherwise requeue deadlines (and hence
wave batching) would diverge between gears.

Spark's XxHash64 expression (catalyst XXH64.java) is the public xxHash64
algorithm (https://github.com/Cyan4973/xxHash spec) applied per column with
the running hash as the next column's seed, starting from seed 42:

* IntegerType  -> XXH64 of the 4-byte little-endian encoding
* LongType     -> XXH64 of the 8-byte little-endian encoding
* StringType   -> XXH64 of the UTF-8 bytes
* null         -> column skipped (hash unchanged)

``tests/test_xxhash_twin.py`` property-checks this module against the JVM
expression on random inputs.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int) -> int:
    """Reference xxHash64 of ``data`` with ``seed`` (unsigned result)."""
    seed &= _M
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, off)
            v1, v2 = _round(v1, l1), _round(v2, l2)
            v3, v4 = _round(v3, l3), _round(v4, l4)
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, off)
        h = (_rotl(h ^ _round(0, k1), 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, off)
        h = (_rotl(h ^ (k1 * _P1) & _M, 23) * _P2 + _P3) & _M
        off += 4
    while off < n:
        h = (_rotl(h ^ (data[off] * _P5) & _M, 11) * _P1) & _M
        off += 1
    return _fmix(h)


def _to_signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Twin of ``F.xxhash64(*cols)`` for int / long / str / None values.

    Plain Python ints are hashed as IntegerType when they fit in 32 bits
    UNLESS wrapped in ``Long(v)``; pass ``Long`` for LongType columns."""
    h = seed & _M
    for v in values:
        if v is None:
            continue
        if isinstance(v, Long):
            h = xxh64(struct.pack("<q", int(v)), h)
        elif isinstance(v, int):
            h = xxh64(struct.pack("<i", v), h)
        elif isinstance(v, str):
            h = xxh64(v.encode("utf-8"), h)
        elif isinstance(v, bytes):
            h = xxh64(v, h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
    return _to_signed(h)


class Long(int):
    """Marker: hash this operand as a Spark LongType (8-byte) column."""


def pmod(n: int, d: int) -> int:
    """Twin of Spark's ``pmod`` for int operands (Java % then fixup)."""
    r = int(math_fmod(n, d))
    return r + d if r != 0 and (r < 0) != (d < 0) else r


def math_fmod(n: int, d: int) -> int:
    # Java's % truncates toward zero; Python's % floors
    q = abs(n) // abs(d)
    r = abs(n) - q * abs(d)
    return -r if n < 0 else r
