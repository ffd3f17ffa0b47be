"""StratifiedSketch: one cardinality sketch per frequency level.

Reference semantics (ref: stratified_sketch.py:120-236): buffer a multiset,
then freeze into sketches {1, 2, .., max_freq-1, 'max+', '1+'} where level k
holds ids with frequency exactly k (capped at max_freq) and '1+' is either
the union of levels or built from the underlying set.

Spark build (the scalable part): ONE pass — ``groupBy(id).count()`` →
``level = least(freq, max_freq)`` → grouped sketch aggregation keyed by
level. The per-level sketches come back as a dict of states; '1+' is the
sketch-space union of levels (epsilon_split=0 path).

Merge of two stratified sketches is the frequency-convolution over a
pluggable sketch operator (ref: stratified_sketch.py:408-476) — driver-side
(max_freq^2 tiny vector ops), deliberately not distributed.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
from pyspark.sql import DataFrame, functions as F

from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)

ONE_PLUS = "1+"


class StratifiedSketch:
    """Driver-side container: level -> sketch state."""

    def __init__(self, kernel: SketchKernel, max_freq: int, sketches: dict[str, State]):
        self.kernel = kernel
        self.max_freq = max_freq
        self.sketches = sketches  # keys: "1".."max_freq-1", f"{max_freq}+", "1+"

    @property
    def max_key(self) -> str:
        return f"{self.max_freq}+"

    def level_keys(self) -> list[str]:
        return [str(k) for k in range(1, self.max_freq)] + [self.max_key]

    def assert_compatible(self, other: "StratifiedSketch") -> None:
        assert self.max_freq == other.max_freq, "max_freq mismatch"
        assert self.kernel.spec() == other.kernel.spec(), "kernel spec mismatch"


def build_stratified(
    df: DataFrame,
    kernel: SketchKernel,
    max_freq: int,
    id_col: str = "item",
) -> StratifiedSketch:
    """Distributed one-pass build (ref semantics: stratified_sketch.py:152-214).

    groupBy(id).count() → level bucket → one grouped-sketch agg keyed by
    level. Ids reaching a sketch are distinct by construction (cardinality
    sketches get each id once, like the reference's add_ids per level).
    """
    freq = df.groupBy(id_col).agg(F.count("*").alias("freq"))
    leveled = freq.select(
        F.when(F.col("freq") >= max_freq, F.lit(f"{max_freq}+"))
        .otherwise(F.col("freq").cast("string"))
        .alias("level"),
        F.col(id_col).alias("item"),
    )
    rows = agg.grouped_sketch(leveled, kernel, ["level"], "item").collect()
    sketches = {r["level"]: kernel.unpack(bytes(r["sketch"])) for r in rows}
    for key in [str(k) for k in range(1, max_freq)] + [f"{max_freq}+"]:
        sketches.setdefault(key, kernel.empty())
    # 1+ = union of all levels (epsilon_split == 0 path,
    # ref: stratified_sketch.py:174-183)
    one_plus = None
    for key in list(sketches.keys()):
        one_plus = sketches[key] if one_plus is None else kernel.merge(one_plus, sketches[key])
    sketches[ONE_PLUS] = one_plus
    return StratifiedSketch(kernel, max_freq, sketches)


def noise_stratified(
    ss: StratifiedSketch,
    noiser_factory: Callable[[float, np.random.RandomState], Callable],
    epsilon: float,
    rng: np.random.RandomState,
    epsilon_split: float = 0.0,
) -> StratifiedSketch:
    """Epsilon-split local-DP noising (ref: stratified_sketch.py:217-225):
    with epsilon_split == 0 every level (incl. the merged 1+) gets the full
    epsilon; otherwise 1+ gets epsilon*split and the levels share the rest.
    ``noiser_factory(eps, rng)`` returns a state->state noiser (e.g.
    lambda e, r: BlipNoiser(e, r))."""
    assert 0 <= epsilon_split < 1
    one_plus_eps = epsilon if epsilon_split == 0 else epsilon * epsilon_split
    rest_eps = epsilon if epsilon_split == 0 else epsilon * (1 - epsilon_split)
    rest = noiser_factory(rest_eps, rng)
    one_plus = noiser_factory(one_plus_eps, rng)
    out = {}
    for key in ss.level_keys():
        out[key] = rest(ss.sketches[key])
    out[ONE_PLUS] = one_plus(ss.sketches[ONE_PLUS])
    return StratifiedSketch(ss.kernel, ss.max_freq, out)


def denoise_stratified(
    ss: StratifiedSketch,
    denoiser_factory: Callable[[float], Callable],
    epsilon: float,
    epsilon_split: float = 0.0,
) -> StratifiedSketch:
    """Per-level SurrealDenoiser with the matching epsilon split
    (ref: stratified_sketch.py:369-406)."""
    one_plus_eps = epsilon if epsilon_split == 0 else epsilon * epsilon_split
    rest_eps = epsilon * (1 - epsilon_split) if epsilon_split else epsilon
    rest = denoiser_factory(rest_eps)
    one_plus = denoiser_factory(one_plus_eps)
    out = {}
    for key in ss.level_keys():
        out[key] = rest([ss.sketches[key]])[0]
    out[ONE_PLUS] = one_plus([ss.sketches[ONE_PLUS]])[0]
    return StratifiedSketch(ss.kernel, ss.max_freq, out)


class StratifiedPairwiseEstimator:
    """Frequency-convolution merge + per-level estimation
    (ref: stratified_sketch.py:408-513)."""

    def __init__(self, sketch_operator, cardinality_estimator: Callable[[State], float]):
        self.op = sketch_operator
        self.estimate_one = cardinality_estimator

    def merge_sketches(self, this: StratifiedSketch, that: StratifiedSketch) -> StratifiedSketch:
        this.assert_compatible(that)
        mf = this.max_freq
        mk = this.max_key
        a, b = this.sketches, that.sketches
        out: dict[str, State] = {}
        for k in range(1, mf):
            # A(k) & B(0) = A(k) - (A(k) ∩ B(1+))
            merged = self.op.difference(
                a[str(k)], self.op.intersection(a[str(k)], b[ONE_PLUS])
            )
            # ∪ B(k) & A(0)
            merged = self.op.union(
                merged,
                self.op.difference(
                    b[str(k)], self.op.intersection(a[ONE_PLUS], b[str(k)])
                ),
            )
            # ∪_{i=1..k-1} A(i) ∩ B(k-i)
            for i in range(1, k):
                merged = self.op.union(
                    merged, self.op.intersection(a[str(i)], b[str(k - i)])
                )
            out[str(k)] = merged
        # Merged(max+) (ref: stratified_sketch.py:455-466)
        merged = a[mk]
        rest = b[ONE_PLUS]
        for k in range(1, mf):
            merged = self.op.union(
                merged, self.op.intersection(a[str(mf - k)], rest)
            )
            rest = self.op.difference(rest, b[str(k)])
        merged = self.op.union(
            merged,
            self.op.difference(b[mk], self.op.intersection(b[mk], a[ONE_PLUS])),
        )
        out[mk] = merged
        # Merged(1+) = union of all levels
        one_plus = None
        for k in range(1, mf):
            one_plus = self.op.union(one_plus, out[str(k)])
        out[ONE_PLUS] = self.op.union(one_plus, out[mk])
        return StratifiedSketch(this.kernel, mf, out)

    def estimate_cardinality(self, s: StratifiedSketch) -> list[float]:
        """k+ histogram: reversed cumsum of per-level estimates
        (ref: stratified_sketch.py:478-513)."""
        per_level = [self.estimate_one(s.sketches[str(k)]) for k in range(1, s.max_freq)]
        per_level.append(self.estimate_one(s.sketches[s.max_key]))
        return [float(x) for x in np.cumsum(per_level[::-1])[::-1]]


def stratified_sequential_estimate(
    sketches: list[StratifiedSketch], estimator: StratifiedPairwiseEstimator
) -> list[float]:
    """functools.reduce of pairwise merges (ref: stratified_sketch.py:516-534)."""
    cur = sketches[0]
    for s in sketches[1:]:
        cur = estimator.merge_sketches(cur, s)
    return estimator.estimate_cardinality(cur)


class StratifiedDriverKernel:
    """Driver-mode kernel adapter: Simulator-protocol wrapper that builds a
    :class:`StratifiedSketch` from ONE multiset of ids (duplicates encode
    frequency), mirroring the reference's
    ``StratifiedSketch.init_from_exact_multi_set``
    (ref: stratified_sketch.py:152-214).

    NOT batch-mergeable: frequencies split across two ``update`` calls would
    land in the wrong levels, so this kernel is only for the driver-mode
    Simulator (one ``update(empty(), whole_set)`` per set — exactly how the
    Simulator calls it). The distributed build is :func:`build_stratified`
    (one groupBy pass over all items).
    """

    associative = False

    def __init__(self, base_kernel: SketchKernel, max_freq: int):
        self.base = base_kernel
        self.max_freq = max_freq

    def _keys(self) -> list[str]:
        return [str(k) for k in range(1, self.max_freq)] + [f"{self.max_freq}+", ONE_PLUS]

    def empty(self) -> StratifiedSketch:
        return StratifiedSketch(
            self.base, self.max_freq, {k: self.base.empty() for k in self._keys()}
        )

    def update(self, ss: StratifiedSketch, ids: np.ndarray) -> StratifiedSketch:
        ids = np.asarray(ids, dtype=np.int64)
        uniq, counts = np.unique(ids, return_counts=True)
        counts = np.minimum(counts, self.max_freq)
        sketches = dict(ss.sketches)
        for lvl in range(1, self.max_freq + 1):
            members = uniq[counts == lvl]
            key = str(lvl) if lvl < self.max_freq else f"{self.max_freq}+"
            if len(members):
                sketches[key] = self.base.update(sketches[key], members)
        if len(uniq):
            # epsilon_split=0 path: 1+ built from the exact distinct set
            # (ref: stratified_sketch.py:174-183)
            sketches[ONE_PLUS] = self.base.update(sketches[ONE_PLUS], uniq)
        return StratifiedSketch(self.base, self.max_freq, sketches)


def build_stratified_grouped(
    df: DataFrame,
    kernel: SketchKernel,
    max_freq: int,
    group_col: str = "source",
    id_col: str = "item",
) -> dict[str, StratifiedSketch]:
    """ONE-pass distributed stratified build for EVERY group at once:
    ``groupBy(group, id).count`` -> frequency level -> grouped-sketch
    aggregation keyed by (group, level). Returns {group: StratifiedSketch}.

    This is the distributed twin of the Simulator's per-set
    StratifiedDriverKernel builds — map-side combine bounds the shuffle at
    (groups x levels x state-size) per partition, so a scenario with
    thousands of publishers is one job, not one job per set."""
    freq = df.groupBy(group_col, id_col).agg(F.count("*").alias("freq"))
    leveled = freq.select(
        F.col(group_col),
        F.when(F.col("freq") >= max_freq, F.lit(f"{max_freq}+"))
        .otherwise(F.col("freq").cast("string"))
        .alias("level"),
        F.col(id_col).alias("item"),
    )
    rows = agg.grouped_sketch(leveled, kernel, [group_col, "level"], "item").collect()
    per_group: dict[str, dict[str, State]] = {}
    for r in rows:
        per_group.setdefault(r[group_col], {})[r["level"]] = kernel.unpack(
            bytes(r["sketch"])
        )
    out: dict[str, StratifiedSketch] = {}
    level_keys = [str(k) for k in range(1, max_freq)] + [f"{max_freq}+"]
    for group, sketches in per_group.items():
        for key in level_keys:
            sketches.setdefault(key, kernel.empty())
        one_plus = None
        for key in level_keys:
            one_plus = (
                sketches[key] if one_plus is None
                else kernel.merge(one_plus, sketches[key])
            )
        sketches[ONE_PLUS] = one_plus
        out[group] = StratifiedSketch(kernel, max_freq, sketches)
    return out
