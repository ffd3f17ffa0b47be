import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_spark.sketches.cascading_legions import (
    CascadingLegionsKernel,
    estimate_from_golden_legion,
)
from cardinality_estimation_evaluation_framework_spark.sketches.liquid_legions import (
    LiquidLegionsKernel,
    Sampler,
    VennEstimator,
    estimate_from_all,
    sequential_estimate,
)


# ---------------- LiquidLegions ----------------

@pytest.mark.parametrize("n", [1_000, 20_000, 100_000])
def test_liquid_legions_cardinality(n):
    k = LiquidLegionsKernel(a=10.0, m=50_000, seed=1)
    st = k.update(k.empty(), np.arange(n, dtype=np.int64))
    est = k.estimate(st)[0]
    assert abs(est - n) / n < 0.05


def test_liquid_legions_partition_invariance():
    k = LiquidLegionsKernel(a=10.0, m=10_000, seed=2)
    ids = np.random.RandomState(0).randint(0, 50_000, 30_000).astype(np.int64)
    whole = k.update(k.empty(), ids)
    parts = [k.update(k.empty(), c) for c in np.array_split(ids, 11)]
    acc = parts[0]
    for p in parts[1:]:
        acc = k.merge(acc, p)
    assert (whole["counts"] == acc["counts"]).all()
    assert (whole["unique"] == acc["unique"]).all()


def test_liquid_legions_frequency_histogram():
    k = LiquidLegionsKernel(a=10.0, m=100_000, seed=3)
    n = 10_000
    st = k.update(k.empty(), np.tile(np.arange(n, dtype=np.int64), 3))
    hist = k.frequency_histogram(st)
    # everyone has frequency 3: dominant bin must be 3
    assert max(hist, key=hist.get) == 3
    assert hist[3] > 0.9


def test_liquid_legions_noise_and_denoised_estimate():
    k = LiquidLegionsKernel(a=10.0, m=50_000, seed=4)
    n = 30_000
    st = k.update(k.empty(), np.arange(n, dtype=np.int64))
    p = 0.1
    noised = k.add_dp_noise(st, p, np.random.RandomState(5))
    est = estimate_from_all(k, [noised], p)
    assert abs(est - n) / n < 0.1


def test_liquid_legions_venn_two_sketches():
    k = LiquidLegionsKernel(a=10.0, m=100_000, seed=6)
    a = k.update(k.empty(), np.arange(0, 20_000, dtype=np.int64))
    b = k.update(k.empty(), np.arange(10_000, 30_000, dtype=np.int64))
    venn = VennEstimator(k, [a, b])()
    # [0, A-B, B-A, A&B] ~ [_, 10000, 10000, 10000]
    for i in (1, 2, 3):
        assert abs(venn[i] - 10_000) / 10_000 < 0.1, venn


def test_liquid_legions_sampler_and_sequential():
    k = LiquidLegionsKernel(a=10.0, m=50_000, seed=7)
    a = k.update(k.empty(), np.arange(0, 15_000, dtype=np.int64))
    b = k.update(k.empty(), np.arange(5_000, 20_000, dtype=np.int64))
    est = sequential_estimate(k, [a, b], seed=11)
    assert abs(est - 20_000) / 20_000 < 0.1
    # sampled diff of clean sketches approximates |A - B| = 5000
    diff = Sampler(k, [a, b], np.random.RandomState(12)).sample_diff()
    est_d = k.estimate(diff)[0]
    assert abs(est_d - 5_000) / 5_000 < 0.25


# ---------------- CascadingLegions ----------------

@pytest.mark.parametrize("n", [5_000, 50_000, 500_000])
def test_cascading_legions_cardinality(n):
    k = CascadingLegionsKernel(l=20, m=10_000, seed=8)
    st = k.update(k.empty(), np.arange(n, dtype=np.int64))
    est = k.estimate(st)[0]
    assert abs(est - n) / n < 0.1


def test_cascading_golden_legion_with_noise():
    k = CascadingLegionsKernel(l=20, m=10_000, seed=9)
    n = 100_000
    st = k.update(k.empty(), np.arange(n, dtype=np.int64))
    p = 0.05
    noised = k.add_dp_noise(st, p, np.random.RandomState(10))
    est, golden = estimate_from_golden_legion(k, [noised], p)
    assert abs(est - n) / n < 0.15
    assert golden >= 0


def test_cascading_partition_invariance():
    k = CascadingLegionsKernel(l=12, m=1_000, seed=10)
    ids = np.random.RandomState(2).randint(0, 100_000, 50_000).astype(np.int64)
    whole = k.update(k.empty(), ids)
    parts = [k.update(k.empty(), c) for c in np.array_split(ids, 7)]
    acc = parts[0]
    for p in parts[1:]:
        acc = k.merge(acc, p)
    assert (whole["counts"] == acc["counts"]).all()
    assert (whole["unique"] == acc["unique"]).all()
