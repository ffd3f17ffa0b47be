import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_spark.operators.set_ops import (
    BayesianAdbfOperator,
    ExpectationAdbfOperator,
    VocSetOperator,
)
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
    first_moment_estimate,
)
from cardinality_estimation_evaluation_framework_spark.sketches.fll import FllKernel
from cardinality_estimation_evaluation_framework_spark.sketches.same_key_aggregator import (
    SameKeyAggregatorKernel,
    standardized_histogram_estimate,
)
from cardinality_estimation_evaluation_framework_spark.sketches.vector_of_counts import (
    VocKernel,
)


def _multiset(n_ids: int, freqs: list[int]) -> np.ndarray:
    """ids 0..n-1, id i repeated freqs[i % len(freqs)] times, shuffled."""
    reps = np.array([freqs[i % len(freqs)] for i in range(n_ids)])
    ids = np.repeat(np.arange(n_ids, dtype=np.int64), reps)
    return np.random.RandomState(7).permutation(ids)


# ---------------- FLL ----------------

def test_fll_partition_invariant_merge():
    k = FllKernel(p=10, seed=1)
    stream = _multiset(20_000, [1, 2, 3])
    whole = k.update(k.empty(), stream)
    for n_parts in (2, 7, 16):
        parts = [k.update(k.empty(), c) for c in np.array_split(stream, n_parts)]
        acc = parts[0]
        for p in parts[1:]:
            acc = k.merge(acc, p)
        for f in ("rho", "fp", "freq"):
            assert (whole[f] == acc[f]).all(), (n_parts, f)


def test_fll_kplus_estimate():
    # every id has frequency 3 → k+ reach = N for k<=3, 0 beyond
    k = FllKernel(p=12, seed=2)
    n = 30_000
    stream = np.tile(np.arange(n, dtype=np.int64), 3)
    st = k.update(k.empty(), stream)
    est = k.estimate(st)
    assert abs(est[0] - n) / n < 0.05          # 1+ reach ~ N
    assert abs(est[2] - n) / n < 0.06          # 3+ reach ~ N
    assert est[3] < 0.05 * n                   # 4+ reach ~ 0


def test_fll_mixed_frequencies():
    k = FllKernel(p=12, seed=3)
    n = 20_000
    # half the ids once, half twice
    stream = np.concatenate(
        [np.arange(n, dtype=np.int64), np.arange(n // 2, dtype=np.int64)]
    )
    st = k.update(k.empty(), stream)
    est = k.estimate(st)
    assert abs(est[0] - n) / n < 0.05
    assert abs(est[1] - n / 2) / (n / 2) < 0.15  # 2+ ~ n/2 (freq dist is sampled)


# ---------------- SameKeyAggregator ----------------

def test_ska_uniform_frequency():
    k = SameKeyAggregatorKernel(m=50_000, decay_rate=10.0, seed=4)
    n = 10_000
    stream = np.tile(np.arange(n, dtype=np.int64), 2)  # everyone freq 2
    st = k.update(k.empty(), stream)
    est = standardized_histogram_estimate(k, st, max_freq=5)
    assert abs(est[0] - n) / n < 0.05     # 1+ = n
    assert abs(est[1] - n) / n < 0.05     # 2+ = n
    assert est[2] < 0.05 * n              # 3+ ~ 0


def test_ska_partition_invariance():
    k = SameKeyAggregatorKernel(m=10_000, decay_rate=10.0, seed=5)
    stream = _multiset(5_000, [1, 3])
    whole = k.update(k.empty(), stream)
    parts = [k.update(k.empty(), c) for c in np.array_split(stream, 9)]
    acc = parts[0]
    for p in parts[1:]:
        acc = k.merge(acc, p)
    assert (whole["keys"] == acc["keys"]).all()
    assert (whole["freq"] == acc["freq"]).all()
    assert np.allclose(whole["bits"], acc["bits"])


def test_ska_histogram_two_sources():
    # source A: ids 0..9999 once; source B: ids 5000..14999 once
    # → 5000 ids with freq 2, 10000 with freq 1
    k = SameKeyAggregatorKernel(m=100_000, decay_rate=10.0, seed=6)
    a = k.update(k.empty(), np.arange(0, 10_000, dtype=np.int64))
    b = k.update(k.empty(), np.arange(5_000, 15_000, dtype=np.int64))
    merged = k.merge(a, b)
    est = standardized_histogram_estimate(k, merged, max_freq=3)
    assert abs(est[0] - 15_000) / 15_000 < 0.05
    assert abs(est[1] - 5_000) / 5_000 < 0.12


# ---------------- ADBF set operators ----------------

def test_bayesian_adbf_operator_accuracy():
    kernel = BloomKernel(dist_kind="exponential", m=100_000, seed=7, decay_rate=10.0)
    a = kernel.update(kernel.empty(), np.arange(0, 20_000, dtype=np.int64))
    b = kernel.update(kernel.empty(), np.arange(10_000, 30_000, dtype=np.int64))
    op = BayesianAdbfOperator(kernel, method="exp")
    inter = op.intersection(a, b)
    diff = op.difference(a, b)
    est_i = first_moment_estimate(kernel, inter, method="exp")
    est_d = first_moment_estimate(kernel, diff, method="exp")
    assert abs(est_i - 10_000) / 10_000 < 0.15
    assert abs(est_d - 10_000) / 10_000 < 0.15


def test_expectation_adbf_operator_golden():
    # golden case from the reference's own test
    # (ref: bloom_filter_sketch_operators_test.py:123-144)
    kernel = BloomKernel(dist_kind="uniform", m=6, seed=1)
    op = ExpectationAdbfOperator(kernel, method="uniform")
    this = {"registers": np.array([1, 0, 1, 1, 0, 0], dtype=np.float64)}
    that = {"registers": np.array([0, 1, 1, 1, 0, 0], dtype=np.float64)}
    inter = op.intersection(this, that)
    np.testing.assert_allclose(
        inter["registers"], [0, 0, 0.698, 0.698, 0, 0], atol=0.01
    )
    # denoised (float) sketches case
    this = {"registers": np.array([1.5, -0.5, 1.5, 1.5, -0.5, -0.5])}
    that = {"registers": np.array([-0.5, 1.5, 1.5, 1.5, -0.5, -0.5])}
    inter = op.intersection(this, that)
    np.testing.assert_allclose(
        inter["registers"], [-0.614, -0.614, 1.843, 1.843, 0.205, 0.205], atol=0.01
    )


def test_voc_set_operator():
    k = VocKernel(num_buckets=4096, seed=8)
    a = k.update(k.empty(), np.arange(0, 20_000, dtype=np.int64))
    b = k.update(k.empty(), np.arange(10_000, 30_000, dtype=np.int64))
    op = VocSetOperator()
    inter = op.intersection(a, b)
    assert abs(float(np.sum(inter["stats"])) - 10_000) / 10_000 < 0.1
