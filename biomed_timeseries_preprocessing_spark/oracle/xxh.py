"""Pure-Python XXH64 — independent reference for Spark's ``xxhash64``.

Implements the public xxHash64 algorithm (Yann Collet's spec,
https://github.com/Cyan4973/xxHash — public knowledge). Spark's
``F.xxhash64`` applies XXH64 with seed 42 to each argument's byte
representation, chaining the running hash as the seed of the next
argument; longs hash via the fixed-width 8-byte path, strings via their
UTF-8 bytes. This module lets pytest verify the xxhash64-based operators
(MinHash signatures, SimHash, fingerprints) against an implementation
that shares no code with the JVM one.
"""

from __future__ import annotations

MASK = 0xFFFFFFFFFFFFFFFF
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of a byte string (unsigned 64-bit result)."""
    n = len(data)
    seed &= MASK
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_long(value: int, seed: int) -> int:
    """Spark's fixed-width LongType path: one 8-byte little-endian lane
    (== XXH64 of the 8 LE bytes)."""
    h = (seed + P5 + 8) & MASK
    h ^= _round(0, value & MASK)
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark's fixed-width IntegerType path: one 4-byte little-endian
    lane (== XXH64 of the 4 LE bytes). Note ``F.lit(7)`` is an int32, so
    MinHash's per-permutation seeds go through THIS path."""
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def spark_xxhash64(*args, seed: int = 42) -> int:
    """Mirror of ``F.xxhash64(*args)``: fold each argument into the
    running hash (signed-int64 result, like Spark). Argument types:
    str → UTF-8 bytes; int → IntegerType 4-byte path (what ``F.lit(n)``
    produces); ("long", n) → LongType 8-byte path."""
    h = seed & MASK
    for a in args:
        if isinstance(a, tuple) and a[0] == "long":
            h = xxh64_long(a[1], h)
        elif isinstance(a, str):
            h = xxh64(a.encode("utf-8"), h)
        elif isinstance(a, int):
            h = xxh64_int(a, h)
        else:  # pragma: no cover
            raise TypeError(f"unsupported arg type {type(a)}")
    return _signed(h)
