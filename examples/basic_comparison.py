"""Generate example sets, estimate cardinality with every sketch family,
and print aggregate accuracy — the reference's examples/basic_comparison.py
re-expressed over this engine's kernel registry.

ref: examples/basic_comparison.py:61-170 (same estimator line-up: uniform/
log/geo/exp bloom filters, cascading legions, exact set, FLL++, HLL++,
vector-of-counts, exact-stratified; same independent-set scenario).

Run:  python examples/basic_comparison.py [--number_of_trials 10]
      [--universe_size 1000000] [--set_size 1000] [--sketch_size 8192]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cardinality_estimation_evaluation_framework_spark.datagen import (
    set_generators as sg,
)
from cardinality_estimation_evaluation_framework_spark.simulation.configs import (
    SketchEstimatorConfig,
)
from cardinality_estimation_evaluation_framework_spark.simulation.estimators import (
    ESTIMATOR_CONFIGS,
)
from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
    Simulator,
)
from cardinality_estimation_evaluation_framework_spark.sketches.exact import (
    ExactMultiSetKernel,
)
from cardinality_estimation_evaluation_framework_spark.sketches.stratified import (
    StratifiedDriverKernel,
    StratifiedPairwiseEstimator,
    stratified_sequential_estimate,
)


class _ExactSetOperator:
    """Exact set algebra on ExactMultiSet states (ref: stratified_sketch.py
    ExactSetOperator) for the exact-stratified example config."""

    @staticmethod
    def _keys(st):
        return st["ids"] if st is not None else np.array([], dtype=np.int64)

    def union(self, a, b):
        if a is None and b is None:
            return None
        keys = np.union1d(self._keys(a), self._keys(b))
        return {"ids": keys, "counts": np.ones(len(keys), dtype=np.int64)}

    def intersection(self, a, b):
        if a is None or b is None:
            return None
        keys = np.intersect1d(self._keys(a), self._keys(b))
        return {"ids": keys, "counts": np.ones(len(keys), dtype=np.int64)}

    def difference(self, a, b):
        if a is None:
            return None
        keys = np.setdiff1d(self._keys(a), self._keys(b))
        return {"ids": keys, "counts": np.ones(len(keys), dtype=np.int64)}


def exact_stratified_config(max_frequency: int) -> SketchEstimatorConfig:
    op = _ExactSetOperator()

    def estimator(kernel, states):
        pe = StratifiedPairwiseEstimator(
            op, lambda st: float(len(st["ids"])) if st is not None else 0.0)
        return stratified_sequential_estimate(states, pe)

    return SketchEstimatorConfig(
        name="exact-stratified",
        kernel_factory=lambda seed: StratifiedDriverKernel(
            ExactMultiSetKernel(), max_frequency),
        estimator=estimator,
        max_frequency=max_frequency,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--universe_size", type=int, default=1_000_000)
    ap.add_argument("--number_of_sets", type=int, default=10)
    ap.add_argument("--number_of_trials", type=int, default=10)
    ap.add_argument("--set_size", type=int, default=1000)
    ap.add_argument("--sketch_size", type=int, default=8192)
    ap.add_argument("--max_frequency", type=int, default=1)
    args = ap.parse_args(argv)

    m = args.sketch_size
    lineup = [
        ESTIMATOR_CONFIGS["uniform_adbf"](m=m),
        ESTIMATOR_CONFIGS["log_adbf"](m=m),
        ESTIMATOR_CONFIGS["geo_adbf"](m=m),
        ESTIMATOR_CONFIGS["exp_adbf"](m=m),
        ESTIMATOR_CONFIGS["cascading_legions"](),
        ESTIMATOR_CONFIGS["exact"](),
        ESTIMATOR_CONFIGS["fll"](),
        ESTIMATOR_CONFIGS["hll"](),
        ESTIMATOR_CONFIGS["voc"](num_buckets=m),
        exact_stratified_config(max(args.max_frequency, 2)),
    ]

    gen_factory = sg.IndependentSetGenerator.factory_with_num_and_size(
        args.universe_size, args.number_of_sets, args.set_size)

    for cfg in lineup:
        print(f"Calculations for {cfg.name}")
        sim = Simulator(
            num_runs=args.number_of_trials,
            set_generator_factory=gen_factory,
            sketch_estimator_config=cfg,
            set_random_state=np.random.RandomState(1),
            sketch_random_state=np.random.RandomState(1),
        )
        _, agg_data = sim.run_all_and_aggregate()
        print(f"Aggregate Statistics for {cfg.name}")
        print(agg_data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
