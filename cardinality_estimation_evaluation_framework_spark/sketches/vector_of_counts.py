"""VectorOfCounts sketch + pairwise/sequential estimators.

Build semantics (ref: vector_of_counts.py:94-132): stats = bincount of
hash(id) mod b over a *set* of ids, added exactly once. The Spark build
preserves the once-only contract structurally: each id occurrence lands in
exactly one input partition once, partials are bincounts of disjoint slices,
and the merge is vector addition — identical to one global bincount. Feeding
a multiset would double-count, exactly as calling the reference's add_ids
twice would; callers dedupe first (``distinct()``) when input is a multiset.

The pairwise merge/union estimator (ref: vector_of_counts.py:244-281) is
ORDER-DEPENDENT by design, so it lives on the driver and folds per-source
sketches in a documented canonical order; only the per-source builds are
distributed (SURVEY §4 physical-execution note).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from cardinality_estimation_evaluation_framework_spark.hashing import hash64
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)


class VocKernel(SketchKernel):
    def __init__(self, num_buckets: int = 4096, seed: int = 0,
                 portable: bool = False, hash_kind: str = "splitmix"):
        self.num_buckets = num_buckets
        self.seed = seed
        # portable=True swaps splitmix64 for the SQL-expressible affine hash
        # so the register vector is reproducible by the DuckDB oracle;
        # hash_kind="farmhash" reproduces the reference's exact bucket path
        # (farmhash64(str(id), seed) % buckets, ref: vector_of_counts.py:95)
        # for register-exact parity tests (per-item Python, test-only)
        self.portable = portable
        self.hash_kind = hash_kind

    def spec(self) -> dict[str, Any]:
        spec = {
            "type": "voc",
            "num_buckets": self.num_buckets,
            "seed": self.seed,
            "portable": self.portable,
        }
        if self.hash_kind != "splitmix":
            spec["hash_kind"] = self.hash_kind
        return spec

    def empty(self) -> State:
        return {"stats": np.zeros(self.num_buckets, dtype=np.float64)}

    def update(self, state: State, values: np.ndarray) -> State:
        if len(values) == 0:
            return state
        if self.portable:
            h = (1103515245 * values.astype(np.int64) + self.seed) % (2**31 - 1)
            idx = h % self.num_buckets
        elif self.hash_kind == "farmhash":
            from cardinality_estimation_evaluation_framework_spark import farmhash64
            idx = np.array(
                [farmhash64.hash64_with_seed(str(int(v)), self.seed)
                 % self.num_buckets for v in values],
                dtype=np.int64,
            )
        else:
            idx = (hash64(values, self.seed) % np.uint64(self.num_buckets)).astype(np.int64)
        state["stats"] += np.bincount(idx, minlength=self.num_buckets)
        return state

    def bucket_sql(self, col: str) -> str:
        """Portable-mode bucket index as ANSI SQL (Spark + DuckDB)."""
        assert self.portable
        return (
            f"CAST(((1103515245 * CAST({col} AS BIGINT) + {self.seed})"
            f" % {2**31 - 1}) % {self.num_buckets} AS INT)"
        )

    def merge(self, a: State, b: State) -> State:
        # disjoint-slice union = vector add (StratifiedSketchOperator union,
        # ref: vector_of_counts_sketch_operator.py:45-60)
        return {"stats": a["stats"] + b["stats"]}

    def estimate(self, state: State) -> list[float]:
        # ref: vector_of_counts.py:131-132
        return [float(np.sum(state["stats"]))]


def cardinality(state: State) -> float:
    return float(np.sum(state["stats"]))


class PairwiseEstimator:
    """Order-dependent pairwise union (ref: vector_of_counts.py:244-334)."""

    def __init__(self, clip: bool = False, epsilon: float = math.log(3), clip_threshold: float = 3):
        self.clip = clip
        self.epsilon = epsilon
        self.clip_threshold = clip_threshold

    @staticmethod
    def intersection(this: State, that: State) -> float:
        """dot of mean-centered vectors (ref: vector_of_counts.py:175-195)."""
        a, b = this["stats"], that["stats"]
        nb = len(a)
        assert nb == len(b), "VectorOfCounts size mismatch"
        ca, cb = float(np.sum(a)), float(np.sum(b))
        return float(np.dot(a - ca / nb, b - cb / nb))

    @staticmethod
    def union(this: State, that: State) -> float:
        ca, cb = cardinality(this), cardinality(that)
        return ca + cb - PairwiseEstimator.intersection(this, that)

    def _std_of_intersection(self, x: float, this: State, that: State) -> float:
        nb = len(this["stats"])
        var = (cardinality(this) * cardinality(that) + x**2) / nb
        var += nb * 4 / self.epsilon**4
        var += (cardinality(this) + cardinality(that)) * 2 / self.epsilon**2
        return math.sqrt(var)

    def _z(self, inter: float, value: float, this: State, that: State) -> float:
        return (inter - value) / self._std_of_intersection(value, this, that)

    def has_zero_intersection(self, inter, this, that) -> bool:
        return self._z(inter, 0, this, that) < self.clip_threshold

    def has_full_intersection(self, inter, this, that) -> bool:
        value = min(cardinality(this), cardinality(that))
        return self._z(inter, value, this, that) > -self.clip_threshold

    def merge(self, this: State, that: State) -> State:
        """Deduped merge: a + b - share (ref: vector_of_counts.py:244-281)."""
        a, b = this["stats"], that["stats"]
        ca, cb = cardinality(this), cardinality(that)
        inter = self.intersection(this, that)
        if self.clip:
            if self.has_zero_intersection(inter, this, that):
                return {"stats": a + b}
            if self.has_full_intersection(inter, this, that):
                return {"stats": a.copy()}
        if ca + cb == 0:
            share = np.ones_like(a) * (inter / len(a))
        else:
            share = inter * (a + b) / (ca + cb)
        return {"stats": a + b - share}

    def clip_empty(self, state: State) -> State:
        """Zero out a likely-empty noisy sketch (ref: vector_of_counts.py:324-331).

        With epsilon = inf (no local noise) the noise std is 0, so there is
        nothing to clip — return the state untouched."""
        if not math.isfinite(self.epsilon):
            return state
        nb = len(state["stats"])
        z = float(np.sum(state["stats"])) / (math.sqrt(nb * 2) / self.epsilon)
        if z < self.clip_threshold:
            return {"stats": np.zeros(nb)}
        return state


def sequential_estimate(
    states: list[State],
    clip: bool = False,
    epsilon: float = math.log(3),
    clip_threshold: float = 3,
) -> float:
    """Left fold of pairwise merges (ref: vector_of_counts.py:294-334).

    Caller supplies states in canonical order (e.g. sorted by source name) —
    the fold is deliberately NOT distributed.
    """
    pe = PairwiseEstimator(clip=clip, epsilon=epsilon, clip_threshold=clip_threshold)
    if clip:
        states = [pe.clip_empty(s) for s in states]
    cur = states[0]
    for s in states[1:]:
        cur = pe.merge(cur, s)
    return cardinality(cur)
