"""Clean-room scalar FarmHash32 (farmhashmk family) for anchoring the
engine's port — written INDEPENDENTLY from the published algorithm
(Google farmhash, farmhashmk.cc, MIT; the mk Hash32 is the CityHash32
lineage) with a deliberately different structure from
``cardinality_estimation_evaluation_framework_spark/farmhash64.py``:
struct.unpack_from fetches, a single combined mix helper, and loop shapes
that do not mirror the port line-for-line.

Why this exists: the 64-bit port contained a real len>64 finalization bug
that line-auditing and self-consistency parity could NOT see — it took an
external implementation (Guava's farmHashFingerprint64) to catch it. No
32-bit farmhash exists in this sandbox's JVM jars or Python packages, so
the next-strongest anchor is an independent re-derivation: a shared
transcription slip between two separately-written implementations is far
less likely than in one. When the real C ``farmhash`` package is present,
tests/test_io_and_misc.py additionally pins both against it bit-exactly.
"""

from __future__ import annotations

import struct

_M = 0xFFFFFFFF
C1 = 0xCC9E2D51
C2 = 0x1B873593


def _f32(s: bytes, i: int) -> int:
    return struct.unpack_from("<I", s, i)[0]


def _ror(x: int, r: int) -> int:
    x &= _M
    return ((x >> r) | (x << (32 - r))) & _M


def _final_mix(h: int) -> int:
    h &= _M
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M
    return h ^ (h >> 16)


def _mur_step(a: int, h: int) -> int:
    a = _ror((a & _M) * C1, 17)
    a = (a * C2) & _M
    h = _ror((h & _M) ^ a, 19)
    return (h * 5 + 0xE6546B64) & _M


def _len_0_4(s: bytes, seed: int) -> int:
    b, c = seed & _M, 9
    for raw in s:
        v = raw if raw < 0x80 else raw - 0x100  # char is signed in the spec
        b = (b * C1 + v) & _M
        c ^= b
    return _final_mix(_mur_step(b, _mur_step(len(s), c)))


def _len_5_12(s: bytes, seed: int) -> int:
    n = len(s)
    a = (n + _f32(s, 0)) & _M
    b = (n * 5 + _f32(s, n - 4)) & _M
    c = (9 + _f32(s, (n >> 1) & 4)) & _M
    d = (n * 5 + seed) & _M
    return _final_mix(seed ^ _mur_step(c, _mur_step(b, _mur_step(a, d))))


def _len_13_24(s: bytes, seed: int) -> int:
    n = len(s)
    a = _f32(s, (n >> 1) - 4)
    b = _f32(s, 4)
    c = _f32(s, n - 8)
    d = _f32(s, n >> 1)
    e = _f32(s, 0)
    f = _f32(s, n - 4)
    h = (d * C1 + n + seed) & _M
    a = (_ror(a, 12) + f) & _M
    h = (_mur_step(c, h) + a) & _M
    a = (_ror(a, 3) + c) & _M
    h = (_mur_step(e, h) + a) & _M
    a = (_ror((a + f), 12) + d) & _M
    h = (_mur_step(b ^ seed, h) + a) & _M
    return _final_mix(h)


def _hash32_long(s: bytes) -> int:
    n = len(s)
    h, g = n & _M, (C1 * n) & _M
    f = g
    tail = {}
    for off in (4, 8, 12, 16, 20):
        tail[off] = (_ror(_f32(s, n - off) * C1, 17) * C2) & _M
    h = _ror(h ^ tail[4], 19)
    h = (h * 5 + 0xE6546B64) & _M
    h = _ror(h ^ tail[16], 19)
    h = (h * 5 + 0xE6546B64) & _M
    g = _ror(g ^ tail[8], 19)
    g = (g * 5 + 0xE6546B64) & _M
    g = _ror(g ^ tail[12], 19)
    g = (g * 5 + 0xE6546B64) & _M
    f = (_ror(f + tail[20], 19) + 113) & _M
    for i in range(0, 20 * ((n - 1) // 20), 20):
        a, b, c, d, e = struct.unpack_from("<5I", s, i)
        h = (h + a) & _M
        g = (g + b) & _M
        f = (f + c) & _M
        h = (_mur_step(d, h) + e) & _M
        g = (_mur_step(c, g) + a) & _M
        f = (_mur_step(b + e * C1, f) + d) & _M
        f = (f + g) & _M
        g = (g + f) & _M
    g = _ror(g, 11) * C1 & _M
    g = _ror(g, 17) * C1 & _M
    f = _ror(f, 11) * C1 & _M
    f = _ror(f, 17) * C1 & _M
    h = _ror(h + g, 19)
    h = (h * 5 + 0xE6546B64) & _M
    h = _ror(h, 17) * C1 & _M
    h = _ror(h + f, 19)
    h = (h * 5 + 0xE6546B64) & _M
    return _ror(h, 17) * C1 & _M


def hash32(data: bytes | str) -> int:
    s = data.encode() if isinstance(data, str) else bytes(data)
    n = len(s)
    if n <= 4:
        return _len_0_4(s, 0)
    if n <= 12:
        return _len_5_12(s, 0)
    if n <= 24:
        return _len_13_24(s, 0)
    return _hash32_long(s)


def hash32_with_seed(data: bytes | str, seed: int) -> int:
    s = data.encode() if isinstance(data, str) else bytes(data)
    n = len(s)
    seed &= _M
    if n <= 4:
        return _len_0_4(s, seed)
    if n <= 12:
        return _len_5_12(s, seed)
    if n <= 24:
        return _len_13_24(s, (seed * C1) & _M)
    h = _len_13_24(s[:24], seed ^ n)
    return _mur_step((hash32(s[24:]) + seed) & _M, h)
