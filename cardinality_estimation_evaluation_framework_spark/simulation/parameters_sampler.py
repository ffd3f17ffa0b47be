"""Parameter samplers for set-generator kwargs.

ref: src/simulations/parameters_sampler.py:17-59 — a named (parameter,
sampler) pair plus a sampler that materializes a kwargs dict. Samplers can
be deterministic or draw from a caller-seeded RandomState, so evaluation
grids can randomize scenario parameters per run.
"""

from __future__ import annotations

from typing import Callable, Iterable, NamedTuple


class ParameterSamplerConfig(NamedTuple):
    """One (name, sampler) pair (ref: parameters_sampler.py:18-37).

    name: keyword argument of the set generator.
    sampler: zero-arg callable returning the value (deterministic or random).
    """

    name: str
    sampler: Callable[[], object]


class ParameterSampler:
    """Materialize sampled kwargs for a set generator
    (ref: parameters_sampler.py:40-59)."""

    def __init__(self, parameter_sampler_config_list: Iterable[ParameterSamplerConfig]):
        self.parameter_sampler_config_list = list(parameter_sampler_config_list)

    def __call__(self) -> dict[str, object]:
        return {c.name: c.sampler() for c in self.parameter_sampler_config_list}
