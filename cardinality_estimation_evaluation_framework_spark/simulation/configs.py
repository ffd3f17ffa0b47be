"""Config dataclasses + named evaluation configs.

ref: src/evaluations/configs.py:17-81 (SketchEstimatorConfig /
ScenarioConfig / EvaluationConfig) and
src/evaluations/data/evaluation_configs.py:134-195 (smoke_test scenarios:
independent, remarketing(subset), fully_overlapping, sequentially
correlated all/one — universe 200k, set size 40k (20k for seq-corr),
20 sets, shared_prop 0.5).

The full grids (complete_test_with_selected_parameters etc.) live in
config_grids.py and are registered here lazily.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

from cardinality_estimation_evaluation_framework_spark.datagen import set_generators as sg

SKETCH_ESTIMATOR_NAME_FORMAT = "{sketch}-{config}-{estimator}-{local_dp}-{global_dp}"


@dataclass
class SketchEstimatorConfig:
    """Unit of evaluation (ref: configs.py:17-48).

    estimator: callable (kernel, list[State]) -> list[float] (k+ histogram).
    """

    name: str
    kernel_factory: Callable[[int], Any]
    estimator: Callable[[Any, list], list]
    sketch_noiser: Callable | None = None  # (kernel, state, rng) -> state
    estimate_noiser: Callable | None = None  # (rng) -> noiser(float)->float
    max_frequency: int = 1


@dataclass
class ScenarioConfig:
    """ref: configs.py:51-60."""

    name: str
    set_generator_factory: Callable[[np.random.RandomState], Any]


@dataclass
class EvaluationConfig:
    """ref: configs.py:63-81."""

    name: str
    num_runs: int
    scenario_config_list: list[ScenarioConfig] = field(default_factory=list)


def smoke_test(num_runs: int = 100, universe_size: int = 200_000,
               num_sets: int = 20, set_size: int | None = None) -> EvaluationConfig:
    """The reference's smoke_test grid (ref: evaluation_configs.py:134-195):
    set_size = 0.2 * universe, seq-corr set_size = 0.1 * universe,
    shared_prop = 0.5. ``set_size`` can be overridden for small tests."""
    if set_size is None:
        set_size = int(universe_size * 0.2)
    seq_set_size = set_size // 2
    return EvaluationConfig(
        name="smoke_test",
        num_runs=num_runs,
        scenario_config_list=[
            ScenarioConfig(
                "independent",
                sg.IndependentSetGenerator.factory_with_num_and_size(
                    universe_size, num_sets, set_size
                ),
            ),
            ScenarioConfig(
                "remarketing",
                sg.IndependentSetGenerator.factory_with_num_and_size(
                    int(universe_size * 0.2), num_sets, set_size
                ),
            ),
            ScenarioConfig(
                "fully_overlapping",
                sg.FullyOverlapSetGenerator.factory_with_num_and_size(
                    universe_size, num_sets, set_size
                ),
            ),
            ScenarioConfig(
                "sequentially_correlated_all",
                sg.SequentiallyCorrelatedSetGenerator.factory_with_num_and_size(
                    sg.ORDER_ORIGINAL, sg.CORRELATED_ALL, 0.5, num_sets, seq_set_size
                ),
            ),
            ScenarioConfig(
                "sequentially_correlated_one",
                sg.SequentiallyCorrelatedSetGenerator.factory_with_num_and_size(
                    sg.ORDER_ORIGINAL, sg.CORRELATED_ONE, 0.5, num_sets, seq_set_size
                ),
            ),
        ],
    )


def frequency_smoke_test(num_runs: int = 100, universe_size: int = 200_000,
                         num_sets: int = 3, set_size: int = 10_000) -> EvaluationConfig:
    """ref: evaluation_configs.py:198-237 (homogeneous / heterogeneous /
    publisher-constant frequency scenarios)."""
    return EvaluationConfig(
        name="frequency_smoke_test",
        num_runs=num_runs,
        scenario_config_list=[
            ScenarioConfig(
                "homogeneous",
                lambda rs: sg.HomogeneousMultiSetGenerator(
                    universe_size, [set_size] * num_sets, [2.0] * num_sets, rs, freq_cap=10
                ),
            ),
            ScenarioConfig(
                "heterogeneous",
                lambda rs: sg.HeterogeneousMultiSetGenerator(
                    universe_size, [set_size] * num_sets, [(1.0, 1.0)] * num_sets, rs, freq_cap=10
                ),
            ),
            ScenarioConfig(
                "publisher_constant_frequency",
                lambda rs: sg.PublisherConstantFrequencySetGenerator(
                    universe_size, [set_size] * num_sets, 3, rs
                ),
            ),
        ],
    )


def global_dp_stress_test(num_runs: int = 100,
                          universe_size: int | None = None) -> EvaluationConfig:
    """Single disjoint sets of growing reach, reference-exact scenario grid
    (ref: evaluation_configs.py:739-756: one set per scenario, reach
    1e3..1e7, scenario names '<id>-reach:<reach>')."""
    _ = universe_size  # accepted to conform to run_evaluation, like the ref
    reaches = [1_000, 10_000, 100_000, 1_000_000, 10_000_000]
    return EvaluationConfig(
        name="global_dp_stress_test",
        num_runs=num_runs,
        scenario_config_list=[
            ScenarioConfig(
                f"{scenario_id}-reach:{reach}",
                (lambda rs, _r=reach: sg.DisjointSetGenerator([_r], rs)),
            )
            for scenario_id, reach in enumerate(reaches)
        ],
    )


def _grid(name):
    """Lazy import: config_grids imports sketches; avoid a cycle here."""
    def factory(*args, **kwargs):
        from cardinality_estimation_evaluation_framework_spark.simulation import (
            config_grids,
        )

        return getattr(config_grids, name)(*args, **kwargs)

    return factory


EVALUATION_CONFIGS = {
    "smoke_test": smoke_test,
    "frequency_smoke_test": frequency_smoke_test,
    "global_dp_stress_test": global_dp_stress_test,
    # full grids (ref: evaluation_configs.py:634-782)
    "complete_test_with_selected_parameters": _grid(
        "complete_test_with_selected_parameters"),
    "complete_frequency_test_with_selected_parameters": _grid(
        "complete_frequency_test_with_selected_parameters"),
    "frequency_end_to_end_test": _grid("frequency_end_to_end_test"),
}


def get_evaluation_config(config_name: str):
    """Name lookup with the reference's duplicate check
    (ref: evaluation_configs.py:784-813)."""
    if config_name not in EVALUATION_CONFIGS:
        raise ValueError(
            "Invalid evaluation config: {}\nValid choices are as follows: {}".format(
                config_name, ",".join(EVALUATION_CONFIGS)))
    return EVALUATION_CONFIGS[config_name]
