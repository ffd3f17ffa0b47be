"""ExponentialSameKeyAggregator + StandardizedHistogramEstimator.

Three parallel register vectors over ONE shared exponential-distribution
index per item (ref: same_key_aggregator.py:59-85):

- ``bits``:  exponential ADBF (reach),
- ``keys``:  unique-key lattice {empty=0, key=id+1, collided=-1},
- ``freq``:  per-register hit counts.

One exploded pass produces all three (the same hash/index batch feeds three
ufunc folds). Merge: expectation-union on bits, lattice on keys, add on freq
(ref: same_key_aggregator.py:233-264) — associative & commutative, so the
partial+tree-merge harness applies unchanged.

Estimator (ref: same_key_aggregator.py:278-335): 1+ reach from the exp ADBF
first-moment inversion x the frequency histogram of *effective* registers
(unique non-collided keys), standardized and reverse-accumulated.

NOTE on unique-key semantics in a distributed build: the lattice needs the
item's identity, not just its hash index, so ``update`` stores key = item+1
(as the reference does, ref: any_sketch.py:93-105). Items must therefore be
non-negative int63; the tokens tables satisfy this by construction.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from cardinality_estimation_evaluation_framework_spark.hashing import hash64
from cardinality_estimation_evaluation_framework_spark.sketches import any_sketch
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
    first_moment_estimate,
)


class SameKeyAggregatorKernel(SketchKernel):
    def __init__(self, m: int = 100_000, decay_rate: float = 10.0, seed: int = 0,
                 hash_kind: str = "splitmix"):
        self.m = m
        self.decay_rate = decay_rate
        self.seed = seed
        # "farmhash" = the reference's exact hash path (AnySketch sub-seed
        # from RandomState(seed), farmhash64(str id, subseed); all three SKA
        # trackers share one seed so one hash drives bits/keys/freq —
        # ref: same_key_aggregator.py:59-84) — parity tests only
        self.hash_kind = hash_kind
        self.dist = any_sketch.ExponentialDist(m, decay_rate)
        # estimator delegate for the reach component
        self._bloom = BloomKernel(
            dist_kind="exponential", m=m, seed=seed, decay_rate=decay_rate,
            hash_kind=hash_kind,
        )
        if hash_kind == "farmhash":
            import sys

            rs = np.random.RandomState(seed)
            self._farmhash_seed = int(rs.randint(sys.maxsize))

    def spec(self) -> dict[str, Any]:
        spec = {
            "type": "ska",
            "m": self.m,
            "decay_rate": self.decay_rate,
            "seed": self.seed,
        }
        if self.hash_kind != "splitmix":
            spec["hash_kind"] = self.hash_kind
        return spec

    def empty(self) -> State:
        return {
            "bits": np.zeros(self.m, dtype=np.float64),
            "keys": np.zeros(self.m, dtype=np.int64),
            "freq": np.zeros(self.m, dtype=np.int64),
        }

    def update(self, state: State, values: np.ndarray) -> State:
        if len(values) == 0:
            return state
        vals = values.astype(np.int64)
        if (vals < 0).any():
            # fold negatives into the positive domain (keys must be > 0)
            vals = np.abs(vals)
        if self.hash_kind == "farmhash":
            from cardinality_estimation_evaluation_framework_spark import farmhash64
            h = np.array(
                [farmhash64.hash64_with_seed(str(int(v)), self._farmhash_seed)
                 for v in vals],
                dtype=np.uint64,
            )
        else:
            h = hash64(vals, self.seed)
        idx = self.dist.indexes(h)
        any_sketch.fold_or(state["bits"], idx)
        any_sketch.fold_sum(state["freq"], idx)
        any_sketch.fold_unique_key(state["keys"], idx, vals + 1)
        return state

    def merge(self, a: State, b: State) -> State:
        return {
            "bits": 1.0 - (1.0 - a["bits"]) * (1.0 - b["bits"]),
            "keys": any_sketch.merge_unique_key(a["keys"], b["keys"]),
            "freq": a["freq"] + b["freq"],
        }

    def estimate(self, state: State, max_freq: int = 10) -> list[float]:
        return standardized_histogram_estimate(self, state, max_freq)


def standardized_histogram_estimate(
    kernel: SameKeyAggregatorKernel,
    state: State,
    max_freq: int = 10,
    reach_noiser=None,
    histogram_noiser=None,
) -> list[float]:
    """k+ reach histogram (ref: same_key_aggregator.py:317-335)."""
    one_plus = first_moment_estimate(
        kernel._bloom, {"registers": state["bits"]}, method="exp", noiser=reach_noiser
    )
    effective = ~np.isin(state["keys"], (any_sketch.UNIQUE_EMPTY, any_sketch.UNIQUE_COLLIDED))
    freq_eff = state["freq"][effective].copy()
    freq_eff[freq_eff > max_freq] = max_freq
    hist = np.bincount(freq_eff.astype(np.int64), minlength=max_freq + 1)[1:].astype(
        np.float64
    )
    if histogram_noiser is not None:
        hist = histogram_noiser(hist)
    total = hist.sum()
    if total <= 0:
        return [0.0] * max_freq
    standardized = hist / total * one_plus
    return [float(x) for x in np.cumsum(standardized[::-1])[::-1]]
