"""CascadingLegions: geometric halving legions + golden-legion estimator.

Reference semantics (ref: src/estimators/cascading_legions.py):

- bucket(f): legion = trailing zeros of the 32-bit fingerprint (capped at
  l-1), position = (f >> (legion+1)) mod m? — the reference divides once
  more after the legion loop: ``f //= 2; legion*m + f % m`` (ref: :55-63)
- per bucket: hit count + fingerprint mask (we track the unique-key lattice,
  sufficient for the |mask|==1 frequency sample, ref: :64-69,126-140)
- expectation curve: sum_l m(1 - exp(-t / (2^l m))) with the LAST legion
  reusing 2^l of the loop (quirk preserved, ref: :85-93)
- golden legion: first legion whose denoised estimate is below saturation
  n/2 * 2^(i+1) (ref: :266-279)
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from cardinality_estimation_evaluation_framework_spark.functions.special import (
    invert_monotonic,
)
from cardinality_estimation_evaluation_framework_spark.hashing import hash64
from cardinality_estimation_evaluation_framework_spark.sketches import any_sketch
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)
from cardinality_estimation_evaluation_framework_spark.sketches.liquid_legions import (
    flip_transition_matrix,
)


class CascadingLegionsKernel(SketchKernel):
    def __init__(self, l: int = 16, m: int = 10_000, seed: int = 0,
                 hash_kind: str = "splitmix"):
        self.l = l
        self.m = m
        self.seed = seed
        # "farmhash32" = the reference's exact fingerprint path (parity tests)
        self.hash_kind = hash_kind

    def spec(self) -> dict[str, Any]:
        spec = {"type": "cascading_legions", "l": self.l, "m": self.m, "seed": self.seed}
        if self.hash_kind != "splitmix":
            spec["hash_kind"] = self.hash_kind
        return spec

    def empty(self) -> State:
        return {
            "counts": np.zeros(self.l * self.m, dtype=np.int64),
            "unique": np.zeros(self.l * self.m, dtype=np.int64),
            "noise": np.zeros(1, dtype=np.float64),
        }

    def _fingerprints(self, values: np.ndarray) -> np.ndarray:
        if self.hash_kind == "farmhash32":
            from cardinality_estimation_evaluation_framework_spark import farmhash64
            return np.array(
                [farmhash64.hash32_with_seed(str(int(v)), self.seed) for v in values],
                dtype=np.int64,
            )
        return (hash64(values, self.seed) & np.uint64(2**32 - 1)).astype(np.int64)

    def buckets_for_fingerprints(self, f: np.ndarray) -> np.ndarray:
        """Vectorized trailing-zero legion assignment (ref: :55-63)."""
        f = f.astype(np.uint64)
        # trailing zeros via isolating lowest set bit; tz(0) treated as capped
        tz = np.zeros(len(f), dtype=np.int64)
        v = f.copy()
        nonzero = v != 0
        for shift in (32, 16, 8, 4, 2, 1):
            mask = np.uint64((1 << shift) - 1)
            movable = nonzero & ((v & mask) == 0)
            tz[movable] += shift
            v[movable] >>= np.uint64(shift)
        tz[~nonzero] = self.l - 1
        legion = np.minimum(tz, self.l - 1)
        # the reference strips ALL trailing zeros before the sentinel-bit
        # shift, even past the legion cap (ref: cascading_legions.py:55-63:
        # the while loop runs to the first set bit, THEN legion is capped) —
        # shift by tz+1, not legion+1
        rest = f >> np.minimum(tz + 1, 63).astype(np.uint64)
        pos = (rest % np.uint64(self.m)).astype(np.int64)
        return legion * self.m + pos

    def update(self, state: State, values: np.ndarray) -> State:
        if len(values) == 0:
            return state
        f = self._fingerprints(values)
        b = self.buckets_for_fingerprints(f)
        any_sketch.fold_sum(state["counts"], b)
        any_sketch.fold_unique_key(state["unique"], b, f + 1)
        return state

    def merge(self, a: State, b: State) -> State:
        assert a["noise"][0] == b["noise"][0]
        return {
            "counts": a["counts"] + b["counts"],
            "unique": any_sketch.merge_unique_key(a["unique"], b["unique"]),
            "noise": a["noise"].copy(),
        }

    def legions_expectation(self, cardinality: float) -> float:
        """ref: cascading_legions.py:85-93 (last-legion quirk preserved)."""
        r = 0.0
        last_l = 0
        for last_l in range(1, self.l):
            r += self.m * (1 - math.exp(-cardinality / (2**last_l * self.m)))
        r += self.m * (1 - math.exp(-cardinality / (2**last_l * self.m)))
        return r

    def estimate(self, state: State) -> list[float]:
        count = int(np.count_nonzero(state["counts"]))
        return [float(invert_monotonic(self.legions_expectation)(count))]

    def frequency_histogram(self, state: State) -> dict[int, float]:
        pure = (state["unique"] > 0) & (state["counts"] > 0)
        sample = state["counts"][pure]
        if len(sample) == 0:
            return {}
        vals, cnts = np.unique(sample, return_counts=True)
        total = cnts.sum()
        return {int(v): float(c) / total for v, c in zip(vals, cnts)}

    def add_dp_noise(self, state: State, p: float, rng: np.random.RandomState) -> State:
        assert state["noise"][0] == 0, "noise can only be added once"
        size = self.l * self.m
        flip = rng.uniform(0, 1, size) < p
        occ = state["counts"] > 0
        counts = state["counts"].copy()
        counts[flip] = np.where(occ[flip], 0, 1)
        return {"counts": counts, "unique": state["unique"].copy(), "noise": np.array([p])}


def estimate_from_one_legion(
    kernel: CascadingLegionsKernel, states: list[State], legion_index: int, p: float
) -> float:
    """Denoised per-legion estimate -ln(1 - f/n) * n * 2^(l+1)
    (ref: cascading_legions.py:258-264)."""
    n = kernel.m
    sl = slice(legion_index * n, (legion_index + 1) * n)
    ones = np.stack([(s["counts"][sl] > 0).astype(np.int64) for s in states])
    v = np.bincount(ones.sum(axis=0), minlength=len(states) + 1).astype(float)
    c = np.linalg.inv(flip_transition_matrix(len(states), p))
    f = v.sum() - c[0, :].dot(v)
    if f > n:
        return 2**legion_index * n * 10
    return -math.log(1 - f / n) * n * (2 ** (legion_index + 1))


def estimate_from_golden_legion(
    kernel: CascadingLegionsKernel, states: list[State], p: float
) -> tuple[float, int]:
    """First non-saturated legion wins (ref: cascading_legions.py:266-279)."""
    n = kernel.m
    e = None
    for i in range(kernel.l):
        e = estimate_from_one_legion(kernel, states, i, p)
        if e < n / 2 * 2 ** (i + 1):
            return e, i
    raise AssertionError(
        f"Not enough legions: {kernel.l} legions but cardinality appears > {e}"
    )
