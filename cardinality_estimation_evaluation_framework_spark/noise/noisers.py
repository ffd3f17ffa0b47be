"""DP noise mechanisms and sketch noisers/denoisers.

Distributed-determinism contract: every noiser takes an explicit
``np.random.RandomState`` (or a seed derived per (run, source, partition) via
``hashing.derive_seeds``) — never module-level RNG state — so results are
reproducible under any scheduling (SURVEY §7 hard-parts note).

Gaussian sigma: the reference delegates to dp_accounting's
``get_smallest_gaussian_noise`` (ref: common/noisers.py:143-146); that
package is unavailable here, so the classical analytic calibration
sigma = delta_f * sqrt(2 ln(1.25/delta)) / eps (Dwork & Roth, Thm A.1) with
eps/num_queries composition is used — slightly conservative, same contract.
"""

from __future__ import annotations

import math

import numpy as np

from cardinality_estimation_evaluation_framework_spark.sketches.base import State


def get_probability_of_flip(epsilon: float, num_hashes: int) -> float:
    """p = 1 / (1 + e^(eps/k)) (ref: bloom_filters.py:525-535)."""
    return 1 / (1 + math.exp(epsilon / num_hashes))


# --------------------------------------------------------------------------
# Sketch (local-DP) noisers — operate on register-vector states
# --------------------------------------------------------------------------

class FixedProbabilityBitFlipNoiser:
    """Flip 0/1 registers with per-state probabilities
    (ref: bloom_filters.py:487-522)."""

    def __init__(
        self,
        random_state: np.random.RandomState,
        probability: float | None = None,
        flip_one_probability: float | None = None,
        flip_zero_probability: float | None = None,
    ):
        if probability is not None:
            self._p = (probability, probability)
        elif flip_one_probability is not None and flip_zero_probability is not None:
            self._p = (flip_zero_probability, flip_one_probability)
        else:
            raise ValueError("provide probability or both flip probabilities")
        self._rng = random_state

    def __call__(self, state: State, key: str = "registers") -> State:
        regs = state[key]
        flip_probs = np.where(regs > 0, self._p[1], self._p[0])
        flipped = np.where(
            self._rng.random_sample(regs.shape) < flip_probs,
            np.bitwise_xor((regs > 0).astype(np.int64), 1).astype(regs.dtype),
            regs,
        )
        out = {k: v.copy() for k, v in state.items()}
        out[key] = flipped
        return out


class BlipNoiser:
    """BLIP: flip w.p. 1/(1+e^(eps/k)) (ref: bloom_filters.py:538-570)."""

    def __init__(self, epsilon: float, random_state: np.random.RandomState, num_hashes: int = 1):
        self._inner = FixedProbabilityBitFlipNoiser(
            random_state, probability=get_probability_of_flip(epsilon, num_hashes)
        )

    def __call__(self, state: State, key: str = "registers") -> State:
        return self._inner(state, key)


class SurrealDenoiser:
    """Closed-form expected raw registers from blipped registers
    (ref: bloom_filters.py:587-631). Output registers are floats; they flow
    through the expectation union 1-(1-a)(1-b) unchanged."""

    def __init__(self, epsilon: float | None = None, probability: float | None = None):
        assert epsilon is not None or probability is not None
        self._p = probability if probability is not None else get_probability_of_flip(epsilon, 1)

    def __call__(self, states: list[State], key: str = "registers") -> list[State]:
        return [self._denoise_one(s, key) for s in states]

    def _denoise_one(self, state: State, key: str) -> State:
        regs = state[key]
        expected_zeros = -regs * self._p + (1 - regs) * (1 - self._p)
        out = {k: v.copy() for k, v in state.items()}
        out[key] = 1 - expected_zeros / (1 - 2 * self._p)
        return out


class VocLaplaceNoiser:
    """Lap(1/eps) per VoC bucket (ref: vector_of_counts.py:37-64)."""

    def __init__(self, epsilon: float, random_state: np.random.RandomState):
        self._epsilon = epsilon
        self._rng = random_state

    def __call__(self, state: State) -> State:
        stats = state["stats"]
        return {"stats": stats + self._rng.laplace(scale=1.0 / self._epsilon, size=stats.shape)}


class IdentityNoiser:
    """No-op (ref: vector_of_counts.py:67-71)."""

    def __call__(self, state: State, key: str | None = None) -> State:
        return {k: v.copy() for k, v in state.items()}


class AddRandomElementsNoiser:
    """Insert n random new ids into an exact multiset
    (ref: exact_set.py:116-133)."""

    def __init__(self, num_random_elements: int, random_state: np.random.RandomState):
        self.n = num_random_elements
        self._rng = random_state

    def __call__(self, kernel, state: State) -> State:
        new_ids = self._rng.randint(2**31, 2**62, size=self.n).astype(np.int64)
        out = {k: v.copy() for k, v in state.items()}
        return kernel.update(out, new_ids)


# --------------------------------------------------------------------------
# Estimate (global-DP) noisers — scalars/arrays, sensitivity 1
# (ref: estimator_noisers.py:21-120, common/noisers.py:21-226)
# --------------------------------------------------------------------------

def _as_array(fn):
    def wrapped(self, estimate):
        if isinstance(estimate, float):
            return float(fn(self, np.array([estimate]))[0])
        return fn(self, np.asarray(estimate, dtype=np.float64))

    return wrapped


class LaplaceEstimateNoiser:
    def __init__(self, epsilon: float, random_state: np.random.RandomState | None = None):
        self._epsilon = epsilon
        self._rng = random_state or np.random.RandomState()

    @_as_array
    def __call__(self, z: np.ndarray) -> np.ndarray:
        return z + self._rng.laplace(size=z.shape, scale=1.0 / self._epsilon)


class GeometricEstimateNoiser:
    """Two-sided geometric (discrete Laplace) (ref: common/noisers.py:57-112)."""

    def __init__(self, epsilon: float, random_state: np.random.RandomState | None = None):
        self._epsilon = epsilon
        self._rng = random_state or np.random.RandomState()

    @_as_array
    def __call__(self, z: np.ndarray) -> np.ndarray:
        p = 1 - math.exp(-self._epsilon)
        return z + self._rng.geometric(size=z.shape, p=p) - self._rng.geometric(size=z.shape, p=p)


def analytic_gaussian_sigma(epsilon: float, delta: float, num_queries: int = 1, sensitivity: float = 1.0) -> float:
    """Classical calibration, composed over num_queries (see module docstring)."""
    eps_per = epsilon / num_queries
    return sensitivity * math.sqrt(2 * math.log(1.25 / delta)) / eps_per


class GaussianEstimateNoiser:
    def __init__(self, epsilon: float, delta: float, num_queries: int = 1,
                 random_state: np.random.RandomState | None = None):
        self._sigma = analytic_gaussian_sigma(epsilon, delta, num_queries)
        self._rng = random_state or np.random.RandomState()

    @_as_array
    def __call__(self, z: np.ndarray) -> np.ndarray:
        return z + self._rng.normal(size=z.shape, scale=self._sigma)


class DiscreteGaussianEstimateNoiser:
    """Rejection sampling of discrete Laplace → discrete Gaussian
    (Canonne et al. 2020, Alg. 3; ref: common/noisers.py:156-226)."""

    def __init__(self, epsilon: float, delta: float, num_queries: int = 1,
                 random_state: np.random.RandomState | None = None):
        self._sigma = analytic_gaussian_sigma(epsilon, delta, num_queries)
        self._rng = random_state or np.random.RandomState()

    def _sample_one(self) -> int:
        t = math.floor(self._sigma) + 1
        sigma_sq = self._sigma**2
        p_geom = 1 - math.exp(-1 / t)
        while True:
            y = int(self._rng.geometric(p=p_geom)) - int(self._rng.geometric(p=p_geom))
            p_bern = math.exp(-((abs(y) - sigma_sq / t) ** 2) * 0.5 / sigma_sq)
            if self._rng.binomial(1, p_bern) == 1:
                return y

    @_as_array
    def __call__(self, z: np.ndarray) -> np.ndarray:
        noise = np.array([self._sample_one() for _ in range(z.size)], dtype=np.float64)
        return z + noise.reshape(z.shape)
