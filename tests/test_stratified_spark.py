import numpy as np
from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.operators.set_ops import (
    BayesianAdbfOperator,
)
from cardinality_estimation_evaluation_framework_spark.sketches.bloom import (
    BloomKernel,
    first_moment_estimate,
)
from cardinality_estimation_evaluation_framework_spark.sketches.stratified import (
    ONE_PLUS,
    StratifiedPairwiseEstimator,
    build_stratified,
)


def _kernel():
    return BloomKernel(dist_kind="exponential", m=50_000, seed=3, decay_rate=10.0)


def test_build_stratified_levels(spark):
    # ids 0..4999 appear once, 5000..7999 twice, 8000..8999 four times (capped 3+)
    ids = np.concatenate(
        [
            np.arange(0, 5_000),
            np.tile(np.arange(5_000, 8_000), 2),
            np.tile(np.arange(8_000, 9_000), 4),
        ]
    )
    df = spark.createDataFrame([(int(x),) for x in ids], "item long").repartition(8)
    kernel = _kernel()
    ss = build_stratified(df, kernel, max_freq=3)
    est = lambda st: first_moment_estimate(kernel, st, method="exp")
    assert abs(est(ss.sketches["1"]) - 5_000) / 5_000 < 0.1
    assert abs(est(ss.sketches["2"]) - 3_000) / 3_000 < 0.1
    assert abs(est(ss.sketches["3+"]) - 1_000) / 1_000 < 0.15
    assert abs(est(ss.sketches[ONE_PLUS]) - 9_000) / 9_000 < 0.1


def test_stratified_pairwise_merge(spark):
    # A: ids 0..5999 once; B: ids 3000..8999 once
    # union freq: 0..2999 ->1, 3000..5999 ->2, 6000..8999 ->1
    a_df = spark.range(0, 6_000).select(F.col("id").alias("item"))
    b_df = spark.range(3_000, 9_000).select(F.col("id").alias("item"))
    kernel = _kernel()
    a = build_stratified(a_df, kernel, max_freq=3)
    b = build_stratified(b_df, kernel, max_freq=3)
    op = BayesianAdbfOperator(kernel, method="exp")
    pe = StratifiedPairwiseEstimator(
        op, lambda st: first_moment_estimate(kernel, st, method="exp")
    )
    est = pe.estimate_cardinality(pe.merge_sketches(a, b))
    # k+ histogram: 1+ = 9000, 2+ = 3000, 3+ ~ 0
    assert abs(est[0] - 9_000) / 9_000 < 0.15
    assert abs(est[1] - 3_000) / 3_000 < 0.25
    assert est[2] < 1_000


def test_simulator_spark_mode_stratified_matches_driver(spark):
    """Distributed grouped stratified build (ONE job for all sets) produces
    the same estimates as the driver-mode per-set build."""
    import numpy as np

    from cardinality_estimation_evaluation_framework_spark.datagen import (
        set_generators as sg,
    )
    from cardinality_estimation_evaluation_framework_spark.simulation import (
        config_grids as g,
    )
    from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
        Simulator,
    )

    gen = lambda rs: sg.HomogeneousMultiSetGenerator(
        2000, [300] * 3, [1, 2, 3], rs, freq_cap=5)
    cfg = g.stratified_sketch_vector_of_counts(3, False, 1024, None)

    def run(spark_arg):
        sim = Simulator(
            num_runs=2,
            set_generator_factory=gen,
            sketch_estimator_config=cfg,
            sketch_random_state=np.random.RandomState(5),
            set_random_state=np.random.RandomState(6),
            spark=spark_arg,
        )
        df, _ = sim()
        return df

    driver_df = run(None)
    spark_df = run(spark)
    for k in (1, 2, 3):
        a = driver_df[f"estimated_cardinality_{k}"].to_numpy(np.float64)
        b = spark_df[f"estimated_cardinality_{k}"].to_numpy(np.float64)
        assert np.allclose(a, b), (k, a, b)
