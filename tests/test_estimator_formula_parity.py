"""Estimate-level parity for the driver-side estimator FORMULAS.

Round-2 verdict item: registers were bit-exact and accuracy-vs-truth was
pytest-bounded, but ours-vs-reference on IDENTICAL states was not asserted,
so a formula transcription slip inside the error band could pass. These
tests close that: both sides are fed the exact same sketch states (built
through the shared FarmHash32/64 path, already proven register-exact) and
the driver-side formulas must agree to float precision:

- LiquidLegions Estimator.estimate_from_all (ref liquid_legions.py:225-267)
- LiquidLegions VennEstimator, k=1 and k=2 (ref :270-370)
- LiquidLegions Sampler priors + posteriors (ref :373-535 — the
  deterministic core; the actual draw uses numpy's global RNG row-by-row
  vs our vectorized inverse-CDF, so sampled BITS are compared
  distributionally in test_legions.py, not bit-wise)
- CascadingLegions golden-legion estimator (ref cascading_legions.py:157-279)
- SKA StandardizedHistogramEstimator (ref same_key_aggregator.py:271-335)
- Bayesian / Expectation ADBF sketch operators
  (ref bloom_filter_sketch_operators.py:80-226)

Tolerances: 1e-9 relative for closed-form arithmetic; 1e-6 relative where
a monotone-inversion (epsilon=1e-7 bisection on both sides) is in the loop.
"""

from __future__ import annotations

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_spark.sketches import (
    any_sketch as a_s,
)
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
)
from cardinality_estimation_evaluation_framework_spark.sketches.cascading_legions import (
    CascadingLegionsKernel,
    estimate_from_golden_legion,
)
from cardinality_estimation_evaluation_framework_spark.sketches.liquid_legions import (
    LiquidLegionsKernel,
    Sampler,
    VennEstimator,
    estimate_from_all,
)
from cardinality_estimation_evaluation_framework_spark.sketches.same_key_aggregator import (
    SameKeyAggregatorKernel,
    standardized_histogram_estimate,
)
from cardinality_estimation_evaluation_framework_spark.operators.set_ops import (
    BayesianAdbfOperator,
    ExpectationAdbfOperator,
)

from reference_loader import ref_module


def _ids(n, seed, hi=10**8):
    return np.unique(
        np.random.RandomState(seed).randint(1, hi, size=n)
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# LiquidLegions: paired state builders
# ---------------------------------------------------------------------------

def _ll_pair(llm, ids, a=10.0, m=1024, seed=5, noise_p=0.0, noise_seed=None):
    """(reference sketch, our state) with identical registers; optional
    identical manual noise (same flip mask applied to both sides, mirroring
    ref add_dp_noise semantics: occupied -> 0, empty -> 1)."""
    ref = llm.LiquidLegions(a=a, m=m, random_seed=seed)
    ref.add_ids([int(x) for x in ids])
    ours = LiquidLegionsKernel(a=a, m=m, seed=seed, hash_kind="farmhash32")
    st = ours.update(ours.empty(), ids)

    if noise_p:
        flip = np.random.RandomState(noise_seed).uniform(0, 1, m) < noise_p
        for i in np.flatnonzero(flip):
            ref.sketch[int(i)] = 0 if ref.sketch.get(int(i), 0) > 0 else 1
        ref.added_noise = noise_p
        occ = st["counts"] > 0
        st["counts"][flip] = np.where(occ[flip], 0, 1)
        st["noise"] = np.array([noise_p])

    # guard: the estimators below assume identical occupancy
    ref_ones = np.zeros(m, dtype=bool)
    for b, c in ref.sketch.items():
        if c > 0:
            ref_ones[b] = True
    assert np.array_equal(ref_ones, st["counts"] > 0)
    return ref, ours, st


@pytest.fixture(scope="module")
def llm():
    return ref_module("estimators.liquid_legions")


def test_ll_estimate_from_all_parity(llm):
    p = 0.08
    ref1, kernel, st1 = _ll_pair(llm, _ids(3000, 1), noise_p=p, noise_seed=101)
    ref2, _, st2 = _ll_pair(llm, _ids(2500, 2), noise_p=p, noise_seed=102)
    theirs = llm.Estimator().__call__([ref1, ref2])[0]
    mine = estimate_from_all(kernel, [st1, st2], p)
    assert mine == pytest.approx(theirs, rel=1e-6)


def test_ll_venn_estimator_parity(llm):
    p = 0.05
    ref1, kernel, st1 = _ll_pair(llm, _ids(2600, 3), noise_p=p, noise_seed=7)
    ref2, _, st2 = _ll_pair(llm, _ids(2100, 4), noise_p=p, noise_seed=8)

    theirs_2 = np.asarray(llm.VennEstimator([ref1, ref2])())
    mine_2 = VennEstimator(kernel, [st1, st2])()
    np.testing.assert_allclose(mine_2, theirs_2, rtol=1e-6, atol=1e-6)

    theirs_1 = np.asarray(llm.VennEstimator([ref1])())
    mine_1 = VennEstimator(kernel, [st1])()
    np.testing.assert_allclose(mine_1, theirs_1, rtol=1e-6, atol=1e-6)


def test_ll_sampler_priors_and_posteriors_parity(llm):
    """The Sampler's deterministic core — venn priors and per-register
    posteriors — must match on identical noised states. (The reference's
    per-register numpy.random.choice draw is inherently sequential; our
    vectorized draw is compared distributionally elsewhere.)"""
    p = 0.05
    ref1, kernel, st1 = _ll_pair(llm, _ids(2400, 5), noise_p=p, noise_seed=21)
    ref2, _, st2 = _ll_pair(llm, _ids(1900, 6), noise_p=p, noise_seed=22)

    theirs = llm.Sampler([ref1, ref2])
    rng = np.random.RandomState(0)
    mine = Sampler(kernel, [st1, st2], rng)

    np.testing.assert_allclose(
        mine._venn_priors(), np.asarray(theirs.get_all_venn_priors()),
        rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(
        mine.posteriors(), np.asarray(theirs.get_all_posteriors()),
        rtol=1e-6, atol=1e-9)


# ---------------------------------------------------------------------------
# CascadingLegions golden legion
# ---------------------------------------------------------------------------

def test_cl_golden_legion_parity():
    clm = ref_module("estimators.cascading_legions")
    l, m, p = 10, 256, 0.07
    ids1, ids2 = _ids(3000, 7), _ids(2200, 8)

    ref1 = clm.CascadingLegions(l, m, random_seed=9)
    ref1.add_ids([int(x) for x in ids1])
    ref2 = clm.CascadingLegions(l, m, random_seed=9)
    ref2.add_ids([int(x) for x in ids2])
    kernel = CascadingLegionsKernel(l=l, m=m, seed=9, hash_kind="farmhash32")
    st1 = kernel.update(kernel.empty(), ids1)
    st2 = kernel.update(kernel.empty(), ids2)

    for ref, st, seed in ((ref1, st1, 31), (ref2, st2, 32)):
        flip = np.random.RandomState(seed).uniform(0, 1, l * m) < p
        for i in np.flatnonzero(flip):
            ref.sketch[int(i)] = 0 if ref.sketch.get(int(i), 0) > 0 else 1
        ref.added_noise = p
        occ = st["counts"] > 0
        st["counts"][flip] = np.where(occ[flip], 0, 1)
        st["noise"] = np.array([p])

    theirs_val, theirs_idx = clm.Estimator.estimate_from_golden_legion(
        [ref1, ref2], p)
    mine_val, mine_idx = estimate_from_golden_legion(kernel, [st1, st2], p)
    assert mine_idx == theirs_idx
    assert mine_val == pytest.approx(theirs_val, rel=1e-9)


# ---------------------------------------------------------------------------
# SKA standardized histogram estimator
# ---------------------------------------------------------------------------

def test_ska_standardized_histogram_parity():
    skam = ref_module("estimators.same_key_aggregator")
    rng = np.random.RandomState(13)
    ids = rng.randint(1, 30_000, size=9000).astype(np.int64)  # multiset

    ref = skam.ExponentialSameKeyAggregator(length=1024, decay_rate=10,
                                            random_seed=3)
    for x in ids:
        ref.add(int(x))
    kernel = SameKeyAggregatorKernel(m=1024, decay_rate=10.0, seed=3,
                                     hash_kind="farmhash")
    st = kernel.update(kernel.empty(), ids)

    for max_freq in (3, 10):
        theirs = skam.StandardizedHistogramEstimator(
            max_freq=max_freq)([ref])
        mine = standardized_histogram_estimate(kernel, st, max_freq=max_freq)
        np.testing.assert_allclose(mine, np.asarray(theirs, dtype=float),
                                   rtol=1e-9, atol=1e-9)


# ---------------------------------------------------------------------------
# Bayesian / Expectation ADBF sketch operators
# ---------------------------------------------------------------------------

def _adbf_pair(ref_bf, ids, m=2048, decay=10, seed=4):
    ref = ref_bf.ExponentialBloomFilter(length=m, decay_rate=decay,
                                        random_seed=seed)
    ref.add_ids([int(x) for x in ids])
    kernel = BloomKernel(dist_kind="exponential", m=m, seed=seed,
                         decay_rate=float(decay), hash_kind="farmhash")
    st = kernel.update(kernel.empty(), ids)
    assert np.array_equal((ref.sketch > 0).astype(float), st["registers"])
    return ref, kernel, st


def test_adbf_sketch_operator_parity():
    ref_bf = ref_module("estimators.bloom_filters")
    ops_mod = ref_module("estimators.bloom_filter_sketch_operators")
    ids1, ids2 = _ids(2500, 9), _ids(2000, 10)
    # overlapping second set: reuse half of ids1
    ids2 = np.unique(np.concatenate([ids2, ids1[: len(ids1) // 2]]))

    ref1, kernel, st1 = _adbf_pair(ref_bf, ids1)
    ref2, _, st2 = _adbf_pair(ref_bf, ids2)

    their_bayes = ops_mod.BayesianApproximationSketchOperator(
        estimation_method="exp")
    my_bayes = BayesianAdbfOperator(kernel, method="exp")
    their_exp = ops_mod.ExpectationApproximationSketchOperator(
        estimation_method="exp")
    my_exp = ExpectationAdbfOperator(kernel, method="exp")

    for theirs_op, mine_op in ((their_bayes, my_bayes), (their_exp, my_exp)):
        t_int = theirs_op.intersection(ref1, ref2).sketch
        m_int = mine_op.intersection(st1, st2)["registers"]
        np.testing.assert_allclose(m_int, t_int, rtol=1e-9, atol=1e-12)

        t_diff = theirs_op.difference(ref1, ref2).sketch
        m_diff = mine_op.difference(st1, st2)["registers"]
        np.testing.assert_allclose(m_diff, t_diff, rtol=1e-9, atol=1e-12)

    t_union = their_bayes.union(ref1, ref2).sketch
    m_union = my_bayes.union(st1, st2)["registers"]
    np.testing.assert_allclose(m_union, t_union, rtol=1e-12)


# ---------------- IndependentSetEstimator goldens ----------------
# Ported from the reference's independent_set_estimator_test.py (the one
# §2.e estimator previously pinned only via the registry).

def _exact_state(ids):
    from cardinality_estimation_evaluation_framework_spark.sketches.exact import (
        ExactMultiSetKernel,
    )

    k = ExactMultiSetKernel()
    return k.update(k.empty(), np.asarray(list(ids), dtype=np.int64)), k


def _independent_estimator(universe_size):
    from cardinality_estimation_evaluation_framework_spark.sketches.exact import (
        lossless_estimate,
    )
    from cardinality_estimation_evaluation_framework_spark.sketches.meta_estimators import (
        IndependentSetEstimator,
    )

    return IndependentSetEstimator(lossless_estimate, universe_size)


def test_independent_set_estimator_empty_list():
    assert _independent_estimator(100)([]) == [0.0]


def test_independent_set_estimator_single_sketch():
    st, _ = _exact_state([1, 2, 2, 3, 3, 3, 4, 5])
    assert _independent_estimator(100)([st]) == pytest.approx([5, 2, 1])


def test_independent_set_estimator_two_sketches_single_frequency():
    st1, _ = _exact_state(range(50))
    st2, _ = _exact_state(range(50))
    assert _independent_estimator(100)([st1, st2]) == pytest.approx([75, 25])


def test_independent_set_estimator_two_sketches_multiple_frequencies():
    st1, _ = _exact_state(list(range(50)) + list(range(20)))
    st2, _ = _exact_state(list(range(30)) + list(range(10)))
    assert _independent_estimator(100)([st1, st2]) == pytest.approx(
        [65, 34, 9, 2])


def test_independent_set_estimator_universe_size_exceeded():
    st, _ = _exact_state(range(11))
    with pytest.raises(AssertionError):
        _independent_estimator(10)([st])
