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
