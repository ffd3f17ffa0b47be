"""Every estimator config x every scenario runs end-to-end without error —
the reference's interoperability suite (ref: tests/interoperability_test.py:
225-404) at reduced scale. Sanity (not tightness): estimates positive and
within a loose factor of truth where the estimator is applicable.
"""

import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_spark.datagen import set_generators as sg
from cardinality_estimation_evaluation_framework_spark.simulation.configs import (
    ScenarioConfig,
    frequency_smoke_test,
    smoke_test,
)
from cardinality_estimation_evaluation_framework_spark.simulation.estimators import (
    ESTIMATOR_CONFIGS,
)
from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
    Simulator,
)

SMALL = dict(num_runs=2, universe_size=20_000, num_sets=3, set_size=2_000)

# configs whose default params need shrinking at this scale
OVERRIDES = {
    "exp_adbf": dict(m=20_000),
    "exp_adbf_blip": dict(m=20_000),
    "exp_adbf_global_dp": dict(m=20_000),
    "log_adbf": dict(m=20_000),
    "geo_adbf": dict(m=20_000),
    "uniform_adbf": dict(m=50_000),
    "liquid_legions": dict(m=20_000),
    "ska": dict(m=20_000),
    "meta_voc": dict(m=20_000),
}

# noisy / intentionally-broken configs: run-without-error only
NO_ACCURACY = {"less_one", "exp_adbf_blip", "exp_adbf_global_dp", "voc"}


@pytest.mark.parametrize("name", sorted(ESTIMATOR_CONFIGS))
@pytest.mark.parametrize("scenario_idx", range(5))
def test_every_estimator_on_every_cardinality_scenario(name, scenario_idx):
    scenario = smoke_test(**SMALL).scenario_config_list[scenario_idx]
    cfg = ESTIMATOR_CONFIGS[name](**OVERRIDES.get(name, {}))
    sim = Simulator(
        num_runs=SMALL["num_runs"],
        set_generator_factory=scenario.set_generator_factory,
        sketch_estimator_config=cfg,
        sketch_random_state=np.random.RandomState(1),
        set_random_state=np.random.RandomState(2),
    )
    df, df_agg = sim()
    assert len(df) == SMALL["num_runs"] * SMALL["num_sets"]
    if name not in NO_ACCURACY:
        rel = df["relative_error_1"].abs()
        assert (rel < 0.25).all(), f"{name}/{scenario.name}: {rel.max()}"


@pytest.mark.parametrize("name", ["fll", "ska", "exact"])
def test_frequency_estimators_on_frequency_scenarios(name):
    eval_cfg = frequency_smoke_test(num_runs=2, universe_size=20_000,
                                    num_sets=2, set_size=2_000)
    cfg = ESTIMATOR_CONFIGS[name](**OVERRIDES.get(name, {}))
    for scenario in eval_cfg.scenario_config_list:
        sim = Simulator(
            num_runs=2,
            set_generator_factory=scenario.set_generator_factory,
            sketch_estimator_config=cfg,
            sketch_random_state=np.random.RandomState(3),
            set_random_state=np.random.RandomState(4),
        )
        df, _ = sim()
        assert (df["estimated_cardinality_1"] > 0).all(), scenario.name
