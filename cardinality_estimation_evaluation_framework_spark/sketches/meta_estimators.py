"""Meta estimators + independence-assumption union estimator.

- MetaVocEstimator (ref: meta_estimators.py:23-179): re-sketch each ADBF's
  ACTIVE register indices into a meta VectorOfCounts, estimate the union's
  active-register count via the VoC sequential estimator, build a fake ADBF
  with that many leading ones, estimate with a bucket-order-independent
  first-moment method.
- IndependentSetEstimator (ref: independent_set_estimator.py:28-110): full
  histogram convolution |A ∪ B| = |A|+|B|-|A||B|/N per frequency pair.
"""

from __future__ import annotations

from itertools import accumulate

import numpy as np

from cardinality_estimation_evaluation_framework_spark.sketches.base import State
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
    first_moment_estimate,
)
from cardinality_estimation_evaluation_framework_spark.sketches.vector_of_counts import (
    VocKernel,
    sequential_estimate,
)


class MetaVocEstimator:
    def __init__(
        self,
        adbf_kernel: BloomKernel,
        num_buckets: int = 4096,
        adbf_method: str | None = None,
        meta_sketch_noiser=None,
        clip: bool = False,
        epsilon: float = float(np.log(3)),
        clip_threshold: float = 3,
    ):
        assert num_buckets > 0
        self.adbf_kernel = adbf_kernel
        self.voc = VocKernel(num_buckets=num_buckets, seed=adbf_kernel.seed)
        self.adbf_method = adbf_method or adbf_kernel.default_method()
        self.meta_sketch_noiser = meta_sketch_noiser
        self.clip = clip
        self.epsilon = epsilon
        self.clip_threshold = clip_threshold

    def __call__(self, adbf_states: list[State]) -> list[float]:
        if not adbf_states:
            return [0.0]
        metas = []
        for st in adbf_states:
            # active register indices (ref: any_sketch.py:406-409)
            active = np.flatnonzero(st["registers"]).astype(np.int64)
            meta = self.voc.update(self.voc.empty(), active)
            if self.meta_sketch_noiser is not None:
                meta = self.meta_sketch_noiser(meta)
            metas.append(meta)
        num_active = int(
            sequential_estimate(
                metas, clip=self.clip, epsilon=self.epsilon, clip_threshold=self.clip_threshold
            )
        )
        fake = self._fake_adbf(num_active)
        return [first_moment_estimate(self.adbf_kernel, fake, method=self.adbf_method)]

    def _fake_adbf(self, num_active_registers: int) -> State:
        """Leading-ones fake sketch (ref: meta_estimators.py:114-145).
        Only valid for estimators that ignore per-bucket identity (uniform,
        log, exp via sum-of-bits)."""
        m = self.adbf_kernel.m
        n = min(max(0, int(num_active_registers)), m)
        regs = np.zeros(m, dtype=np.float64)
        regs[:n] = 1.0
        return {"registers": regs}


def independent_union_histogram(
    histograms: list[list[float]], universe_size: int
) -> list[float]:
    """Union-under-independence of cumulative histograms
    (ref: independent_set_estimator.py:48-110)."""
    if not histograms:
        return [0.0]
    a_hist: list[float] = [0.0]
    for ch in histograms:
        b_hist = [ch[i] - ch[i + 1] for i in range(len(ch) - 1)] + [ch[-1]]
        c_hist = list(a_hist) + [0.0] * (len(b_hist) + 1)
        for i in range(len(b_hist)):
            c_hist[i] += b_hist[i]
        for i in range(len(a_hist)):
            for j in range(len(b_hist)):
                overlap = a_hist[i] * b_hist[j] / float(universe_size)
                if overlap:
                    c_hist[i] -= overlap
                    c_hist[j] -= overlap
                    c_hist[i + j + 1] += overlap
        a_hist = c_hist
        assert sum(a_hist) <= universe_size, "sketch larger than universe"
    while a_hist and a_hist[-1] == 0:
        a_hist.pop()
    return list(reversed(list(accumulate(reversed(a_hist))))) or [0.0]


class IndependentSetEstimator:
    """ref: independent_set_estimator.py:28-110."""

    def __init__(self, single_sketch_estimator, universe_size: int):
        self.single = single_sketch_estimator
        self.universe_size = universe_size

    def __call__(self, states: list[State]) -> list[float]:
        if not states:
            return [0.0]
        hists = [self.single([st]) for st in states]
        return independent_union_histogram(hists, self.universe_size)
