"""Full config-grid port: counts, name grammar, ParameterSampler, and the
reference's interoperability sweep (every generated estimator config
actually runs; a representative subset goes end-to-end through
evaluate -> analyze -> report), mirroring ref
tests/interoperability_test.py:406-474."""

from __future__ import annotations

import math
import warnings

import numpy as np
import pandas as pd
import pytest

from cardinality_estimation_evaluation_framework_spark.simulation import (
    config_grids as g,
)
from cardinality_estimation_evaluation_framework_spark.simulation.configs import (
    EVALUATION_CONFIGS,
    get_evaluation_config,
    smoke_test,
)
from cardinality_estimation_evaluation_framework_spark.simulation.evaluator import (
    Evaluator,
    read_results,
)
from cardinality_estimation_evaluation_framework_spark.simulation.parameters_sampler import (
    ParameterSampler,
    ParameterSamplerConfig,
)
from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
    Simulator,
)

warnings.filterwarnings("ignore")


# ---------------------------------------------------------------------------
# grammar + registry structure
# ---------------------------------------------------------------------------

def test_name_grammar_matches_reference():
    """Pin the exact name strings the reference grammar produces
    (ref: evaluation_configs.py:893-952)."""
    ln3 = math.log(3)
    assert (
        g.construct_sketch_estimator_config_name(
            "exp_bloom_filter", "100000_10", "first_moment_exp",
            sketch_epsilon=ln3, estimate_epsilon=ln3)
        == "exp_bloom_filter-100000_10-first_moment_exp-local_dp_1.0986-global_dp_1.0986"
    )
    assert (
        g.construct_sketch_estimator_config_name(
            "vector_of_counts", "4096", "sequential")
        == "vector_of_counts-4096-sequential-no_local_dp-no_global_dp"
    )
    # budget-split grammar (ref: :844-891)
    assert (
        g.construct_sketch_estimator_config_name(
            "exp_bloom_filter", "100000_10", "first_moment_exp",
            estimate_epsilon=ln3, estimate_delta=1e-5,
            num_estimate_queries=10, noise_type=g.GAUSSIAN_NOISE)
        == "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-"
           "global_dp_1.0986,0.0000100-gaussian_noise-budget_split-10"
    )
    # max_frequency suffix
    assert g.construct_sketch_estimator_config_name(
        "exact_multi_set", "10000", "lossless", max_frequency="3"
    ).endswith("-3")
    with pytest.raises(AssertionError):
        g.construct_sketch_estimator_config_name("has-dash", "1", "x")


def test_cardinality_grid_structure():
    """Same generator loops as ref evaluation_configs.py:1367-1437:
    48 ADBF + 432 budget-split + 46 limit-test + 8 VoC + 8 independent
    + 1 HLL + 16 metavoc_exp + 8 metavoc_bf = 567 configs."""
    card = g.generate_cardinality_estimator_configs()
    assert len(card) == 567
    names = [c.name for c in card]
    # duplicates exist by construction ((None, None) budget-split rows
    # collapse to the no-dp name) and are collapsed dict-style, like the
    # reference's {conf.name: conf}
    assert len(set(names)) == 459
    assert "hyper_log_log_plus-16384-hll_cardinality-no_local_dp-no_global_dp" in names
    assert (
        "log_bloom_filter-100000-first_moment_log-local_dp_1.0986-global_dp_1.0986"
        in names
    )
    assert (
        "geo_bloom_filter-250000_0.000008-first_moment_geo-no_local_dp-no_global_dp"
        in names
    )
    # limit-test rows carry 8-decimal epsilons
    assert any("global_dp_0.00010986" in n for n in names)


def test_frequency_grid_structure():
    """ref: evaluation_configs.py:1689-1727 — 16 stratified VoC + 32
    stratified exp ADBF + 16 stratified geo ADBF + 1 exact + 4 SKA = 69."""
    freq = g.generate_frequency_estimator_configs(3)
    assert len(freq) == 69
    names = [c.name for c in freq]
    assert len(set(names)) == 69
    assert all(n.endswith("-3") for n in names)
    assert sum("stratified_sketch_vector_of_counts" in n for n in names) == 16
    assert sum("stratified_sketch_exp_adbf" in n for n in names) == 32
    assert sum("stratified_sketch_geo_adbf" in n for n in names) == 16
    assert sum("exp_same_key_aggregator" in n for n in names) == 4


def test_complete_eval_config_scenario_counts():
    """ref scenario grids: 6+6 scenario-1/2 + 6+6 bow + 2 overlap + 3
    subset + 72 seq-corr = 101; frequency 12+12+4 = 28."""
    cc = g.complete_test_with_selected_parameters()
    assert len(cc.scenario_config_list) == 101
    assert len({s.name for s in cc.scenario_config_list}) == 101
    cf = g.complete_frequency_test_with_selected_parameters()
    assert len(cf.scenario_config_list) == 28
    e2e = g.frequency_end_to_end_test()
    assert len(e2e.scenario_config_list) == 1
    # all named configs resolve through the registry lookup
    for name in ("complete_test_with_selected_parameters",
                 "complete_frequency_test_with_selected_parameters",
                 "frequency_end_to_end_test", "smoke_test"):
        assert get_evaluation_config(name) is EVALUATION_CONFIGS[name]
    with pytest.raises(ValueError, match="Invalid evaluation config"):
        get_evaluation_config("nope")


def test_get_estimator_configs_by_name():
    name = "vector_of_counts-4096-sequential-no_local_dp-no_global_dp"
    got = g.get_estimator_configs_by_name([name], max_frequency=3)
    assert got[0].name == name
    with pytest.raises(ValueError, match="Invalid estimator"):
        g.get_estimator_configs_by_name(["nope"], max_frequency=3)
    with pytest.raises(ValueError, match="No estimators"):
        g.get_estimator_configs_by_name([], max_frequency=3)


def test_parameter_sampler():
    """ref: parameters_sampler.py:40-59."""
    rs = np.random.RandomState(5)
    sampler = ParameterSampler([
        ParameterSamplerConfig("universe_size", lambda: 1000),
        ParameterSamplerConfig("num_sets", lambda: int(rs.randint(2, 5))),
    ])
    kwargs = sampler()
    assert kwargs["universe_size"] == 1000
    assert 2 <= kwargs["num_sets"] < 5
    # sampled kwargs drive a generator directly
    from cardinality_estimation_evaluation_framework_spark.datagen import (
        set_generators as sg,
    )
    gen = sg.IndependentSetGenerator(
        kwargs["universe_size"], [50] * kwargs["num_sets"], np.random.RandomState(1))
    assert len(list(gen)) == kwargs["num_sets"]


# ---------------------------------------------------------------------------
# interoperability: every config in both registries RUNS
# (ref: interoperability_test.py:406-474, at its universe_size=1000 scale)
# ---------------------------------------------------------------------------

def _run_one(cfg, scenario, num_runs=1):
    sim = Simulator(
        num_runs=num_runs,
        set_generator_factory=scenario.set_generator_factory,
        sketch_estimator_config=cfg,
        sketch_random_state=np.random.RandomState(7),
        set_random_state=np.random.RandomState(11),
    )
    df, df_agg = sim()
    assert len(df) > 0 and len(df_agg) > 0
    return df


def test_full_cardinality_registry_runs():
    """Every unique cardinality config executes on a rotating smoke
    scenario without error and yields a numeric estimate."""
    unique = list({c.name: c for c in
                   g.generate_cardinality_estimator_configs()}.values())
    scenarios = smoke_test(
        num_runs=1, universe_size=1000, num_sets=5).scenario_config_list
    for i, cfg in enumerate(unique):
        df = _run_one(cfg, scenarios[i % len(scenarios)])
        est = df["estimated_cardinality_1"].to_numpy(dtype=np.float64)
        assert est.shape == (5,), cfg.name
        # noised estimates may be extreme but never missing
        assert not np.isnan(est[0]), cfg.name


def test_full_frequency_registry_runs():
    """Every frequency config executes on the frequency_end_to_end_test
    scenario (max_frequency=3, like the reference's interop test)."""
    unique = list({c.name: c for c in
                   g.generate_frequency_estimator_configs(3)}.values())
    scenario = g.frequency_end_to_end_test(
        num_runs=1, universe_size=1000).scenario_config_list[0]
    for cfg in unique:
        df = _run_one(cfg, scenario)
        for k in (1, 2, 3):
            assert f"estimated_cardinality_{k}" in df.columns, cfg.name


def test_clean_grid_configs_are_accurate():
    """The no-noise grid rows must actually estimate: <25% relative error
    at the 1+ level on an independent scenario."""
    names = [
        "exp_bloom_filter-100000_10-first_moment_exp-no_local_dp-no_global_dp",
        "log_bloom_filter-100000-first_moment_log-no_local_dp-no_global_dp",
        "geo_bloom_filter-100000_0.000020-first_moment_geo-no_local_dp-no_global_dp",
        "vector_of_counts-4096-sequential-no_local_dp-no_global_dp",
        "hyper_log_log_plus-16384-hll_cardinality-no_local_dp-no_global_dp",
    ]
    scenario = smoke_test(
        num_runs=1, universe_size=1000, num_sets=5).scenario_config_list[0]
    for cfg in g.get_estimator_configs_by_name(names, max_frequency=1):
        df = _run_one(cfg, scenario, num_runs=3)
        assert (df["relative_error_1"].abs() < 0.25).all(), cfg.name


def test_grid_subset_end_to_end_evaluate_analyze_report(tmp_path, spark):
    """One config per family through Evaluator -> analyzer -> report files
    (the reference's workflow-compatibility check at small scale)."""
    ln3 = math.log(3)
    configs = [
        g.exp_bloom_filter_first_moment_exp(100_000, ln3, ln3),
        g.vector_of_counts_4096_sequential(None, ln3),
        g.independent_set_estimator_config(ln3, None),
        g.hll_plus(),
        g.meta_voc_for_bf(5_000_000, 4096, None),
        g.liquid_legions_sequential(None),
    ]
    ev_config = smoke_test(num_runs=2, universe_size=1000, num_sets=4)
    ev = Evaluator(ev_config, configs, str(tmp_path), workers=4, random_seed=3)
    cells = ev()
    assert len(cells) == len(configs) * 5
    raw = read_results(spark, str(tmp_path), "smoke_test")
    assert raw.count() == len(configs) * 5 * 2 * 4  # cells x runs x sets

    from cardinality_estimation_evaluation_framework_spark.simulation.analyzer import (
        num_estimable_sets_df,
    )
    metric = num_estimable_sets_df(raw, error_margins=[0.05], proportions=[0.5])
    assert metric.count() == len(configs) * 5

    pytest.importorskip("matplotlib")
    from cardinality_estimation_evaluation_framework_spark.simulation.report import (
        generate_html_report,
    )
    out = generate_html_report(
        metric.toPandas(), None, str(tmp_path / "report"))
    assert (tmp_path / "report").exists() and out


def test_frequency_grid_end_to_end_evaluate(tmp_path):
    """Frequency families through the Evaluator on frequency_end_to_end_test
    (ref: interoperability_test.py:439-474)."""
    ln3 = math.log(3)
    configs = [
        g.stratified_sketch_vector_of_counts(3, False, 1024, None),
        g.stratified_sketch_exp_adbf(3, 100_000, None, None, "expectation"),
        g.exact_multi_set_config(3),
        g.exp_same_key_aggregator_config(3, ln3, 100_000),
    ]
    ev_config = g.frequency_end_to_end_test(num_runs=1, universe_size=1000)
    cells = Evaluator(ev_config, configs, str(tmp_path), workers=2)()
    assert len(cells) == len(configs)
    from cardinality_estimation_evaluation_framework_spark.simulation.evaluator import (
        _path_safe,
    )

    agg = pd.read_parquet(
        tmp_path / "frequency_end_to_end_test"
        / f"estimator={_path_safe(configs[2].name)}"
        / f"scenario={_path_safe(ev_config.scenario_config_list[0].name)}"
        / "df_agg.parquet")
    assert len(agg) > 0
