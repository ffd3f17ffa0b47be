"""Pure-Python FarmHash64 (the ``farmhashna::Hash64`` family).

The reference hashes every id through ``farmhash.hash64withseed(str(x),
seed)`` (ref: src/common/hash_function.py:53-56). The C extension is not
available in this environment, so this module reimplements the public
FarmHash algorithm (Google, MIT-licensed, published at
github.com/google/farmhash) in Python:

- ``hash64(data)``                 = farmhashna::Hash64
- ``hash64_with_seed(data, seed)`` = farmhashna::Hash64WithSeed
  (= HashLen16(Hash64(s) - k2, seed))

Exactness: when the real ``farmhash`` package IS importable the test suite
cross-checks this implementation bit-for-bit against it
(tests/test_hashing.py); in environments without it, both our kernels and
the in-process reference classes are driven through THIS implementation,
so register-exact parity tests do not depend on the C library.

Performance note: this is a per-item Python loop — it exists for parity
testing and for the optional ``hash_kind='farmhash'`` kernel mode, not for
the production hash path (vectorized splitmix64 / JVM xxhash64).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F


def _rot(v: int, s: int) -> int:
    return ((v >> s) | (v << (64 - s))) & MASK64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & MASK64


def _fetch64(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i:i + 8], "little")


def _fetch32(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i:i + 4], "little")


def _hash_len_16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & MASK64
    a ^= a >> 47
    b = ((v ^ a) * mul) & MASK64
    b ^= b >> 47
    return (b * mul) & MASK64


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (K2 + n * 2) & MASK64
        a = (_fetch64(s) + K2) & MASK64
        b = _fetch64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & MASK64
        d = ((_rot(a, 25) + b) * mul) & MASK64
        return _hash_len_16(c, d, mul)
    if n >= 4:
        mul = (K2 + n * 2) & MASK64
        a = _fetch32(s)
        return _hash_len_16((n + (a << 3)) & MASK64, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & MASK64
        z = (n + (c << 2)) & MASK64
        return (_shift_mix((y * K2 ^ z * K0) & MASK64) * K2) & MASK64
    return K2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & MASK64
    a = (_fetch64(s) * K1) & MASK64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & MASK64
    d = (_fetch64(s, n - 16) * K2) & MASK64
    return _hash_len_16(
        (_rot((a + b) & MASK64, 43) + _rot(c, 30) + d) & MASK64,
        (a + _rot((b + K2) & MASK64, 18) + c) & MASK64,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (K2 + n * 2) & MASK64
    a = (_fetch64(s) * K2) & MASK64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & MASK64
    d = (_fetch64(s, n - 16) * K2) & MASK64
    y = (_rot((a + b) & MASK64, 43) + _rot(c, 30) + d) & MASK64
    z = _hash_len_16(y, (a + _rot((b + K2) & MASK64, 18) + c) & MASK64, mul)
    e = (_fetch64(s, 16) * mul) & MASK64
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & MASK64
    h = ((z + _fetch64(s, n - 24)) * mul) & MASK64
    return _hash_len_16(
        (_rot((e + f) & MASK64, 43) + _rot(g, 30) + h) & MASK64,
        (e + _rot((f + a) & MASK64, 18) + g) & MASK64,
        mul,
    )


def _weak_hash_len_32_with_seeds(w: int, x: int, y: int, z: int, a: int, b: int):
    a = (a + w) & MASK64
    b = _rot((b + a + z) & MASK64, 21)
    c = a
    a = (a + x + y) & MASK64
    b = (b + _rot(a, 44)) & MASK64
    return (a + z) & MASK64, (b + c) & MASK64


def _weak32(s: bytes, i: int, a: int, b: int):
    return _weak_hash_len_32_with_seeds(
        _fetch64(s, i), _fetch64(s, i + 8), _fetch64(s, i + 16),
        _fetch64(s, i + 24), a, b)


def hash64(data: bytes | str) -> int:
    """farmhashna::Hash64 of a byte string."""
    s = data.encode() if isinstance(data, str) else bytes(data)
    n = len(s)
    if n <= 32:
        return _hash_len_0_to_16(s) if n <= 16 else _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    seed = 81
    x = seed
    y = (seed * K1 + 113) & MASK64
    z = (_shift_mix((y * K2 + 113) & MASK64) * K2) & MASK64
    v = (0, 0)
    w = (0, 0)
    x = (x * K2 + _fetch64(s)) & MASK64
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & MASK64, 37) * K1) & MASK64
        y = (_rot((y + v[1] + _fetch64(s, i + 48)) & MASK64, 42) * K1) & MASK64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & MASK64
        z = (_rot((z + w[0]) & MASK64, 33) * K1) & MASK64
        v = _weak32(s, i, (v[1] * K1) & MASK64, (x + w[0]) & MASK64)
        w = _weak32(s, i + 32, (z + w[1]) & MASK64, (y + _fetch64(s, i + 16)) & MASK64)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (K1 + ((z & 0xFF) << 1)) & MASK64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & MASK64, w[1])
    v = ((v[0] + w[0]) & MASK64, v[1])
    w = ((w[0] + v[0]) & MASK64, w[1])
    # NOTE: this final block multiplies by `mul`, not K1 — a K1 here passes
    # every self-consistency test but diverges from true FarmHash for
    # len > 64 (caught by the Guava farmHashFingerprint64 anchor).
    x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & MASK64, 37) * mul) & MASK64
    y = (_rot((y + v[1] + _fetch64(s, i + 48)) & MASK64, 42) * mul) & MASK64
    x ^= (w[1] * 9) & MASK64
    y = (y + v[0] * 9 + _fetch64(s, i + 40)) & MASK64
    z = (_rot((z + w[0]) & MASK64, 33) * mul) & MASK64
    v = _weak32(s, i, (v[1] * mul) & MASK64, (x + w[0]) & MASK64)
    w = _weak32(s, i + 32, (z + w[1]) & MASK64, (y + _fetch64(s, i + 16)) & MASK64)
    z, x = x, z
    return _hash_len_16(
        (_hash_len_16(v[0], w[0], mul) + _shift_mix(y) * K0 + z) & MASK64,
        (_hash_len_16(v[1], w[1], mul) + x) & MASK64,
        mul,
    )


_K_MUL = 0x9DDFEA08EB382D69  # Hash128to64's kMul


def _hash_128_to_64(u: int, v: int) -> int:
    """The two-arg HashLen16 (= CityHash's Hash128to64)."""
    a = ((u ^ v) * _K_MUL) & MASK64
    a ^= a >> 47
    b = ((v ^ a) * _K_MUL) & MASK64
    b ^= b >> 47
    return (b * _K_MUL) & MASK64


def hash64_with_seeds(data: bytes | str, seed0: int, seed1: int) -> int:
    """farmhashna::Hash64WithSeeds = HashLen16(Hash64(s) - seed0, seed1)."""
    return _hash_128_to_64((hash64(data) - seed0) & MASK64, seed1 & MASK64)


def hash64_with_seed(data: bytes | str, seed: int) -> int:
    """farmhashna::Hash64WithSeed = Hash64WithSeeds(s, k2, seed)
    — the function behind ``farmhash.hash64withseed``."""
    return hash64_with_seeds(data, K2, seed)


# ---------------------------------------------------------------------------
# FarmHash32 (the farmhashmk::Hash32 family behind ``farmhash.hash32withseed``,
# used by the reference's LiquidLegions/CascadingLegions fingerprints —
# ref: liquid_legions.py:94). Same caveats as the 64-bit port above: pure
# Python, parity/testing use; cross-checked against the C extension when
# it is importable.
# ---------------------------------------------------------------------------

MASK32 = (1 << 32) - 1
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _rot32(v: int, s: int) -> int:
    return ((v >> s) | (v << (32 - s))) & MASK32


def _fmix32(h: int) -> int:
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & MASK32
    h ^= h >> 16
    return h


def _mur(a: int, h: int) -> int:
    a = (a * _C1) & MASK32
    a = _rot32(a, 17)
    a = (a * _C2) & MASK32
    h ^= a
    h = _rot32(h, 19)
    return (h * 5 + 0xE6546B64) & MASK32


def _hash32_len_0_to_4(s: bytes, seed: int = 0) -> int:
    b, c = seed & MASK32, 9
    for byte in s:
        v = byte - 256 if byte >= 128 else byte  # signed char semantics
        b = (b * _C1 + v) & MASK32
        c ^= b
    return _fmix32(_mur(b, _mur(len(s), c)))


def _hash32_len_5_to_12(s: bytes, seed: int = 0) -> int:
    n = len(s)
    a = n & MASK32
    b = (n * 5) & MASK32
    c = 9
    d = (b + seed) & MASK32
    a = (a + _fetch32(s, 0)) & MASK32
    b = (b + _fetch32(s, n - 4)) & MASK32
    c = (c + _fetch32(s, (n >> 1) & 4)) & MASK32
    return _fmix32((seed ^ _mur(c, _mur(b, _mur(a, d)))) & MASK32)


def _hash32_len_13_to_24(s: bytes, seed: int = 0) -> int:
    n = len(s)
    a = _fetch32(s, (n >> 1) - 4)
    b = _fetch32(s, 4)
    c = _fetch32(s, n - 8)
    d = _fetch32(s, n >> 1)
    e = _fetch32(s, 0)
    f = _fetch32(s, n - 4)
    h = (d * _C1 + n + seed) & MASK32
    a = (_rot32(a, 12) + f) & MASK32
    h = (_mur(c, h) + a) & MASK32
    a = (_rot32(a, 3) + c) & MASK32
    h = (_mur(e, h) + a) & MASK32
    a = (_rot32((a + f) & MASK32, 12) + d) & MASK32
    h = (_mur((b ^ seed) & MASK32, h) + a) & MASK32
    return _fmix32(h)


def hash32(data: bytes | str) -> int:
    """farmhashmk::Hash32."""
    s = data.encode() if isinstance(data, str) else bytes(data)
    n = len(s)
    if n <= 4:
        return _hash32_len_0_to_4(s)
    if n <= 12:
        return _hash32_len_5_to_12(s)
    if n <= 24:
        return _hash32_len_13_to_24(s)

    h, g = n & MASK32, (_C1 * n) & MASK32
    f = g
    a0 = (_rot32((_fetch32(s, n - 4) * _C1) & MASK32, 17) * _C2) & MASK32
    a1 = (_rot32((_fetch32(s, n - 8) * _C1) & MASK32, 17) * _C2) & MASK32
    a2 = (_rot32((_fetch32(s, n - 16) * _C1) & MASK32, 17) * _C2) & MASK32
    a3 = (_rot32((_fetch32(s, n - 12) * _C1) & MASK32, 17) * _C2) & MASK32
    a4 = (_rot32((_fetch32(s, n - 20) * _C1) & MASK32, 17) * _C2) & MASK32
    h ^= a0
    h = (_rot32(h, 19) * 5 + 0xE6546B64) & MASK32
    h ^= a2
    h = (_rot32(h, 19) * 5 + 0xE6546B64) & MASK32
    g ^= a1
    g = (_rot32(g, 19) * 5 + 0xE6546B64) & MASK32
    g ^= a3
    g = (_rot32(g, 19) * 5 + 0xE6546B64) & MASK32
    f = (_rot32((f + a4) & MASK32, 19) + 113) & MASK32
    i = 0
    iters = (n - 1) // 20
    while iters:
        a = _fetch32(s, i)
        b = _fetch32(s, i + 4)
        c = _fetch32(s, i + 8)
        d = _fetch32(s, i + 12)
        e = _fetch32(s, i + 16)
        h = (h + a) & MASK32
        g = (g + b) & MASK32
        f = (f + c) & MASK32
        h = (_mur(d, h) + e) & MASK32
        g = (_mur(c, g) + a) & MASK32
        f = (_mur((b + e * _C1) & MASK32, f) + d) & MASK32
        f = (f + g) & MASK32
        g = (g + f) & MASK32
        i += 20
        iters -= 1
    g = (_rot32(g, 11) * _C1) & MASK32
    g = (_rot32(g, 17) * _C1) & MASK32
    f = (_rot32(f, 11) * _C1) & MASK32
    f = (_rot32(f, 17) * _C1) & MASK32
    h = _rot32((h + g) & MASK32, 19)
    h = (h * 5 + 0xE6546B64) & MASK32
    h = (_rot32(h, 17) * _C1) & MASK32
    h = _rot32((h + f) & MASK32, 19)
    h = (h * 5 + 0xE6546B64) & MASK32
    return (_rot32(h, 17) * _C1) & MASK32


def hash32_with_seed(data: bytes | str, seed: int) -> int:
    """farmhashmk::Hash32WithSeed — behind ``farmhash.hash32withseed``."""
    s = data.encode() if isinstance(data, str) else bytes(data)
    n = len(s)
    seed &= MASK32
    if n <= 24:
        if n >= 13:
            return _hash32_len_13_to_24(s, (seed * _C1) & MASK32)
        if n >= 5:
            return _hash32_len_5_to_12(s, seed)
        return _hash32_len_0_to_4(s, seed)
    h = _hash32_len_13_to_24(s[:24], (seed ^ n) & MASK32)
    return _mur((hash32(s[24:]) + seed) & MASK32, h)
