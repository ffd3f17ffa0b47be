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


def test_venn_general_path_matches_k2_reference_formulas():
    """The Möbius solve (k >= 3 path) must reproduce the reference's k=2
    closed form on the same combination counts — the clamp-free cells are
    algebraically identical (x1 = a|b - b etc.), so equality is exact."""
    k = LiquidLegionsKernel(a=10.0, m=50_000, seed=13)
    a = k.update(k.empty(), np.arange(0, 15_000, dtype=np.int64))
    b = k.update(k.empty(), np.arange(8_000, 22_000, dtype=np.int64))
    venn = VennEstimator(k, [a, b])
    f = venn.estimate_combinations()
    np.testing.assert_allclose(venn._general(f), venn(), rtol=1e-9)


def test_venn_three_sketches():
    """k=3 (beyond the reference's NotImplementedError): region estimates
    track the true Venn regions of three overlapping ranges."""
    k = LiquidLegionsKernel(a=10.0, m=200_000, seed=14)
    A = np.arange(0, 30_000, dtype=np.int64)
    B = np.arange(20_000, 50_000, dtype=np.int64)
    C = np.arange(25_000, 65_000, dtype=np.int64)
    sts = [k.update(k.empty(), s) for s in (A, B, C)]
    venn = VennEstimator(k, sts)()
    # region index bitmask: 1=A only, 2=B only, 4=C only, 3=A&B only, ...
    truth = {
        1: 20_000,          # [0, 20k)
        2: 0,               # B only: none ([20k,25k) is A&B, rest in C)
        3: 5_000,           # A&B not C: [20k, 25k)
        4: 15_000,          # C only: [50k, 65k)
        6: 20_000,          # B&C not A: [30k, 50k)
        7: 5_000,           # A&B&C: [25k, 30k)
        5: 0,               # A&C not B: none
    }
    for region, t in truth.items():
        assert abs(venn[region] - t) <= max(0.12 * t, 2_500), (region, venn)
    union_est = venn[1:].sum()
    assert abs(union_est - 65_000) / 65_000 < 0.05


def _exact_venn_regions(sets: list[np.ndarray]) -> dict[int, int]:
    """True |region| for every nonempty membership bitmask."""
    universe = np.unique(np.concatenate(sets))
    mask = np.zeros(len(universe), dtype=np.int64)
    for i, s in enumerate(sets):
        mask += (1 << i) * np.isin(universe, s)
    counts = np.bincount(mask, minlength=2 ** len(sets))
    return {r: int(counts[r]) for r in range(1, 2 ** len(sets))}


@pytest.mark.parametrize("kk", [4, 5])
def test_venn_k4_k5_property(kk):
    """k=4 and k=5 Möbius solves (the reference stops at k=2): every
    region estimate tracks the exact region size of overlapping ranges,
    and the implied union matches. Tolerances widen with k (variance of
    the subset-union estimates compounds through the solve)."""
    k = LiquidLegionsKernel(a=10.0, m=300_000, seed=21)
    step = 12_000
    # staircase of ranges, each shifted by step with 2*step overlap ->
    # rich mix of empty and nonempty regions
    sets = [
        np.arange(i * step, i * step + 3 * step, dtype=np.int64)
        for i in range(kk)
    ]
    sts = [k.update(k.empty(), s) for s in sets]
    venn = VennEstimator(k, sts)()
    truth = _exact_venn_regions(sets)
    n_union = len(np.unique(np.concatenate(sets)))
    tol_rel = 0.15 if kk == 4 else 0.2
    tol_abs = 3_000 if kk == 4 else 4_500
    for region, t in truth.items():
        assert abs(venn[region] - t) <= max(tol_rel * t, tol_abs), (
            kk, region, t, venn[region])
    union_est = venn[1:].sum()
    assert abs(union_est - n_union) / n_union < 0.06


def test_venn_k_ceiling_clear_error():
    k = LiquidLegionsKernel(a=10.0, m=1_000, seed=22)
    sts = [k.update(k.empty(), np.arange(10, dtype=np.int64))
           for _ in range(VennEstimator.MAX_K + 1)]
    with pytest.raises(ValueError, match="k <= 8"):
        VennEstimator(k, sts)


def test_sampler_three_sketches_priors_posteriors_and_sample():
    """k=3 Sampler: the general prior expansion is a proper distribution,
    agrees with the k=2 closed form when forced onto 2 sketches, and
    posterior sampling of 3 clean sketches reproduces the sketches."""
    k = LiquidLegionsKernel(a=10.0, m=20_000, seed=15)
    A = np.arange(0, 8_000, dtype=np.int64)
    B = np.arange(4_000, 12_000, dtype=np.int64)
    sts2 = [k.update(k.empty(), s) for s in (A, B)]
    s2 = Sampler(k, sts2, np.random.RandomState(1))
    # general expansion == reference closed form for k=2
    idx = np.arange(k.m)
    v = k.hit_probability(idx, s2.venn_cardinalities)
    np.testing.assert_allclose(
        s2._venn_priors_general(v), s2._venn_priors(), rtol=1e-9, atol=1e-12)

    C = np.arange(6_000, 16_000, dtype=np.int64)
    sts3 = [k.update(k.empty(), s) for s in (A, B, C)]
    s3 = Sampler(k, sts3, np.random.RandomState(2))
    priors = s3._venn_priors()
    np.testing.assert_allclose(priors.sum(axis=1), 1.0, atol=1e-9)
    assert (priors >= -1e-12).all()
    post = s3.posteriors()
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-9)
    # clean sketches (p=0): the posterior is a point mass on the observed
    # combination, so sampling must reproduce the occupancy exactly
    sampled = s3.sample()
    for orig, samp in zip(sts3, sampled):
        np.testing.assert_array_equal(
            (orig["counts"] > 0).astype(np.int64), samp["counts"])


def test_sampler_prior_dp_matches_brute_enumeration():
    """The OR-convolution DP (round 4) must equal the brute subset-sum
    expansion it replaced, term for term — re-derived here independently
    over the full 2^(2^k - 1) region subsets at k=3."""
    k = LiquidLegionsKernel(a=10.0, m=500, seed=31)
    sets = [np.arange(i * 120, i * 120 + 260, dtype=np.int64) for i in range(3)]
    sts = [k.update(k.empty(), s) for s in sets]
    smp = Sampler(k, sts, np.random.RandomState(3))
    idx = np.arange(k.m)
    v = smp.kernel.hit_probability(idx, smp.venn_cardinalities)
    dp = smp._venn_priors_general(v)

    n_regions = 7
    vr = np.clip(v[:, 1:], 0.0, 1.0)
    brute = np.zeros((k.m, 8))
    for r_mask in range(2**n_regions):
        prob = np.ones(k.m)
        bits = 0
        for t in range(1, n_regions + 1):
            if r_mask >> (t - 1) & 1:
                bits |= t
                prob = prob * vr[:, t - 1]
            else:
                prob = prob * (1 - vr[:, t - 1])
        brute[:, bits] += prob
    np.testing.assert_allclose(dp, brute, rtol=1e-9, atol=1e-12)


def test_sampler_four_sketches():
    """k=4 Sampler (brute expansion would be 32768 full-m passes; the DP
    makes it routine): priors/posteriors are proper distributions, and
    sampling clean sketches reproduces their occupancy exactly."""
    k = LiquidLegionsKernel(a=10.0, m=30_000, seed=16)
    sets = [np.arange(i * 4_000, i * 4_000 + 9_000, dtype=np.int64)
            for i in range(4)]
    sts = [k.update(k.empty(), s) for s in sets]
    smp = Sampler(k, sts, np.random.RandomState(4))
    priors = smp._venn_priors()
    assert priors.shape == (k.m, 16)
    np.testing.assert_allclose(priors.sum(axis=1), 1.0, atol=1e-9)
    post = smp.posteriors()
    np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-9)
    for orig, samp in zip(sts, smp.sample()):
        np.testing.assert_array_equal(
            (orig["counts"] > 0).astype(np.int64), samp["counts"])
    with pytest.raises(AssertionError, match="k <= 6"):
        Sampler(k, sts * 2, np.random.RandomState(5))


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
