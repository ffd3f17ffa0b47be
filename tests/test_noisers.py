import math

import numpy as np

from cardinality_estimation_evaluation_framework_spark.noise.noisers import (
    BlipNoiser,
    DiscreteGaussianEstimateNoiser,
    FixedProbabilityBitFlipNoiser,
    GaussianEstimateNoiser,
    GeometricEstimateNoiser,
    LaplaceEstimateNoiser,
    SurrealDenoiser,
    get_probability_of_flip,
)
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
    first_moment_estimate,
    union_states,
)


def test_flip_probability_formula():
    assert abs(get_probability_of_flip(math.log(3), 1) - 0.25) < 1e-12


def test_bit_flip_noiser_rate():
    rng = np.random.RandomState(0)
    noiser = FixedProbabilityBitFlipNoiser(rng, probability=0.25)
    regs = np.zeros(100_000)
    regs[:50_000] = 1
    noised = noiser({"registers": regs})
    flipped = np.mean(noised["registers"] != regs)
    assert abs(flipped - 0.25) < 0.01


def test_blip_then_denoise_recovers_estimate():
    # blip at eps=ln(3) then SurrealDenoiser: first-moment estimate over the
    # denoised union should still land near truth (larger tolerance — this is
    # the reference's own DP pipeline, ref: bloom_filters.py:538-631)
    n = 20_000
    kernel = BloomKernel(dist_kind="exponential", m=100_000, seed=1, decay_rate=10.0)
    epsilon = math.log(3)
    states = []
    for i in range(2):
        ids = np.arange(i * 10_000, i * 10_000 + n, dtype=np.int64)
        st = kernel.update(kernel.empty(), ids)
        states.append(BlipNoiser(epsilon, np.random.RandomState(100 + i))(st))
    denoised = SurrealDenoiser(epsilon=epsilon)(states)
    union = union_states(kernel, denoised)
    est = first_moment_estimate(kernel, union, method="exp")
    true_union = n + 10_000
    assert abs(est - true_union) / true_union < 0.2


def test_denoiser_expectation_identity():
    # denoise(E[noised]) == raw in expectation: check on deterministic blend
    p = 0.25
    raw = np.array([1.0, 0.0, 1.0, 0.0])
    expected_noised = raw * (1 - p) + (1 - raw) * p
    den = SurrealDenoiser(probability=p)([{"registers": expected_noised}])[0]
    np.testing.assert_allclose(den["registers"], raw, atol=1e-12)


def test_estimate_noisers_center_and_determinism():
    for cls, kwargs in [
        (LaplaceEstimateNoiser, dict(epsilon=1.0)),
        (GeometricEstimateNoiser, dict(epsilon=1.0)),
        (GaussianEstimateNoiser, dict(epsilon=1.0, delta=1e-5)),
        (DiscreteGaussianEstimateNoiser, dict(epsilon=1.0, delta=1e-5)),
    ]:
        n1 = cls(random_state=np.random.RandomState(42), **kwargs)
        n2 = cls(random_state=np.random.RandomState(42), **kwargs)
        a = n1(1000.0)
        assert a == n2(1000.0), cls.__name__  # seeded determinism
        samples = np.array([cls(random_state=np.random.RandomState(s), **kwargs)(1000.0) for s in range(300)])
        assert abs(samples.mean() - 1000.0) < 3 * samples.std() / math.sqrt(300) + 1e-9


def test_geometric_noiser_integer_offsets():
    n = GeometricEstimateNoiser(epsilon=0.5, random_state=np.random.RandomState(1))
    out = n(100.0)
    assert out == int(out)
