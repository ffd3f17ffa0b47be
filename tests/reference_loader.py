"""Import the reference implementation in-process for parity tests.

The reference repo (/root/reference — PUBLIC content, read-only) ships the
package ``wfa_cardinality_estimation_evaluation_framework`` via ``src/``.
Two of its C-extension / heavyweight deps are absent in this image, so we
inject lightweight shims BEFORE loading it:

- ``farmhash``  -> our pure-Python FarmHash64 (farmhash64.py). Both sides
  of every parity test then hash through the SAME implementation, so
  register-exact comparisons do not depend on the C library's bit-level
  truth (which the gated test in test_hashing.py checks when the real
  package is importable).
- ``scipy``     -> numpy formulas for the three entry points the reference
  touches (stats.geom.pmf/cdf, special.expi).
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import types

import numpy as np

REFERENCE_ROOT = pathlib.Path("/root/reference")
PKG = "wfa_cardinality_estimation_evaluation_framework"


def _install_farmhash_shim() -> None:
    try:
        import farmhash  # noqa: F401  (real C extension present)
        return
    except ImportError:
        pass
    from cardinality_estimation_evaluation_framework_spark import farmhash64

    shim = types.ModuleType("farmhash")
    shim.hash64withseed = lambda s, seed: farmhash64.hash64_with_seed(
        s if isinstance(s, (str, bytes)) else str(s), seed)
    shim.hash64 = lambda s: farmhash64.hash64(
        s if isinstance(s, (str, bytes)) else str(s))
    shim.hash32withseed = lambda s, seed: farmhash64.hash32_with_seed(
        s if isinstance(s, (str, bytes)) else str(s), seed)
    shim.hash32 = lambda s: farmhash64.hash32(
        s if isinstance(s, (str, bytes)) else str(s))
    shim.__is_pure_python_shim__ = True
    sys.modules["farmhash"] = shim


def _install_scipy_shim() -> None:
    try:
        import scipy  # noqa: F401
        return
    except ImportError:
        pass
    from cardinality_estimation_evaluation_framework_spark.functions.special import (
        expi,
    )

    scipy_mod = types.ModuleType("scipy")
    stats_mod = types.ModuleType("scipy.stats")
    special_mod = types.ModuleType("scipy.special")

    class _Geom:
        @staticmethod
        def pmf(k, p):
            k = np.asarray(k, dtype=np.float64)
            return np.power(1 - p, k - 1) * p

        @staticmethod
        def cdf(k, p):
            k = np.asarray(k, dtype=np.float64)
            return 1 - np.power(1 - p, np.floor(k))

    def _comb(n, k, exact=False):  # scipy.special.comb semantics (float)
        n, k = int(n), int(k)
        if k < 0 or n < 0 or k > n:
            return 0 if exact else 0.0
        c = __import__("math").comb(n, k)
        return c if exact else float(c)

    stats_mod.geom = _Geom()
    special_mod.expi = np.vectorize(expi, otypes=[np.float64])
    special_mod.comb = _comb
    scipy_mod.stats = stats_mod
    scipy_mod.special = special_mod
    sys.modules["scipy"] = scipy_mod
    sys.modules["scipy.stats"] = stats_mod
    sys.modules["scipy.special"] = special_mod


def _install_dp_accounting_shim() -> None:
    try:
        import dp_accounting  # noqa: F401
        return
    except ImportError:
        pass
    from cardinality_estimation_evaluation_framework_spark.noise.noisers import (
        analytic_gaussian_sigma,
    )

    dp_mod = types.ModuleType("dp_accounting")
    acct_mod = types.ModuleType("dp_accounting.accountant")
    common_mod = types.ModuleType("dp_accounting.common")

    class DifferentialPrivacyParameters:
        def __init__(self, epsilon, delta=0.0):
            self.epsilon = epsilon
            self.delta = delta

    def get_smallest_gaussian_noise(params, num_queries=1, sensitivity=1.0):
        return analytic_gaussian_sigma(
            params.epsilon, params.delta, num_queries, sensitivity)

    common_mod.DifferentialPrivacyParameters = DifferentialPrivacyParameters
    acct_mod.get_smallest_gaussian_noise = get_smallest_gaussian_noise
    dp_mod.accountant = acct_mod
    dp_mod.common = common_mod
    sys.modules["dp_accounting"] = dp_mod
    sys.modules["dp_accounting.accountant"] = acct_mod
    sys.modules["dp_accounting.common"] = common_mod


def load_reference():
    """Return the reference package, importing it on first use."""
    if PKG in sys.modules:
        return sys.modules[PKG]
    _install_farmhash_shim()
    _install_scipy_shim()
    _install_dp_accounting_shim()
    spec = importlib.util.spec_from_file_location(
        PKG,
        REFERENCE_ROOT / "src" / "__init__.py",
        submodule_search_locations=[str(REFERENCE_ROOT / "src")],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[PKG] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_module(name: str):
    """Import e.g. ``estimators.freq_log_log`` from the reference."""
    load_reference()
    return importlib.import_module(f"{PKG}.{name}")
