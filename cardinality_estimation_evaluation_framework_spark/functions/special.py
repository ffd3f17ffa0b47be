"""Special functions needed by estimators, implemented from public formulas
(Abramowitz & Stegun §5.1) because scipy is not available in this image.

Only the exponential integral Ei(x) for x < 0 is required (the exp-ADBF
first-moment inversion, ref: bloom_filters.py:398-424 uses
``scipy.special.expi`` at negative arguments).
"""

from __future__ import annotations

import math

_EULER_GAMMA = 0.5772156649015329


def _e1(x: float) -> float:
    """E1(x) for x > 0: series for small x, continued fraction for large."""
    if x <= 0:
        raise ValueError("E1 defined here for x > 0")
    if x <= 1.0:
        # power series: E1(x) = -gamma - ln x + sum_{k>=1} (-1)^{k+1} x^k/(k*k!)
        total = -_EULER_GAMMA - math.log(x)
        term = 1.0
        for k in range(1, 40):
            term *= -x / k
            total -= term / k
            if abs(term / k) < 1e-18 * max(abs(total), 1e-300):
                break
        return total
    # modified Lentz continued fraction: E1(x) = e^-x / (x + 1/(1 + 1/(x + 2/(1 + ...))))
    b = x + 1.0
    c = 1e308
    d = 1.0 / b
    h = d
    for i in range(1, 200):
        a = -(i * i)
        b += 2.0
        d = 1.0 / (a * d + b)
        c = b + a / c
        delta = c * d
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return h * math.exp(-x)


def expi(x: float) -> float:
    """Ei(x). For x < 0: Ei(x) = -E1(-x). Ei(0) = -inf."""
    if x == 0:
        return -math.inf
    if x < 0:
        return -_e1(-x)
    # positive branch (series; adequate for moderate x, not used by estimators)
    total = _EULER_GAMMA + math.log(x)
    term = 1.0
    for k in range(1, 200):
        term *= x / k
        total += term / k
        if term / k < 1e-16 * abs(total):
            break
    return total


def invert_monotonic(f, lower: float = 0.0, epsilon: float = 1e-3):
    """Invert an increasing function by doubling probe + bisection — the
    reference's EXACT probe/bracket sequence (ref: bloom_filters.py:31-53),
    reproduced step for step so estimates that route through an inversion
    (first-moment any/geo/exp) are bit-identical to the reference, not
    merely within the bisection epsilon.

    Quirk faithfully kept: the probe starts at 1 regardless of ``lower``
    and each failed probe REPLACES the left bracket (``left = probe``),
    so when ``lower > 1`` the bracket temporarily widens below the caller's
    lower bound. Harmless for an increasing f (the root stays bracketed;
    a few extra halvings), but it shifts the midpoint grid — a tighter
    variant here made randomized-parity trials differ from the reference
    by up to 2*epsilon (caught by tools/fuzz_parity.py, round 6)."""
    f0 = f(lower)

    def inversion(y: float) -> float:
        assert f0 <= y, f"inversion below domain: f({lower})={f0} > {y}"
        left, probe = lower, 1.0
        while f(probe) < y:
            left = probe
            probe *= 2
        right = probe
        mid = (right + left) / 2
        while right - left > epsilon:
            if f(mid) > y:
                right = mid
            else:
                left = mid
            mid = (right + left) / 2
        return mid

    return inversion
