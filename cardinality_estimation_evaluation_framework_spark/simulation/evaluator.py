"""Evaluator: (scenario x estimator) grid → partitioned parquet results.

The reference fans the grid out over a pathos process pool and writes a CSV
directory tree (ref: evaluator.py:207-342, 45-109). Here:

- the grid runs as concurrent jobs in ONE SparkSession via a thread pool —
  Spark's scheduler interleaves them (the executor pool replaces the process
  pool; set spark.scheduler.mode=FAIR for fairness),
- results land as parquet partitioned by (estimator, scenario) — the
  analyzer reads them back with partition pruning,
- per-scenario seeded RandomStates guarantee every estimator sees identical
  data (ref: evaluator.py:264-270),
- per-task wall/CPU time is recorded to a metrics JSON (ref:
  evaluator.py:166-204 aggregate_and_write_times).
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

from cardinality_estimation_evaluation_framework_spark.hashing import derive_seeds
from cardinality_estimation_evaluation_framework_spark.simulation.configs import (
    EvaluationConfig,
    SketchEstimatorConfig,
)
from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
    Simulator,
)

RAW_DF = "df.parquet"
AGG_DF = "df_agg.parquet"


class Evaluator:
    def __init__(
        self,
        evaluation_config: EvaluationConfig,
        sketch_estimator_config_list: list[SketchEstimatorConfig],
        out_dir: str,
        workers: int = 4,
        random_seed: int = 42,
        spark=None,
    ):
        self.evaluation_config = evaluation_config
        self.estimator_configs = sketch_estimator_config_list
        self.out_dir = out_dir
        self.workers = workers
        self.random_seed = random_seed
        self.spark = spark

    def _scenario_seeds(self) -> dict[str, int]:
        """One seed per scenario, shared by all estimators
        (ref: evaluator.py:264-270)."""
        names = [s.name for s in self.evaluation_config.scenario_config_list]
        seeds = derive_seeds(self.random_seed, len(names))
        return {n: int(s % (2**31 - 1)) for n, s in zip(names, seeds)}

    def _run_cell(self, estimator_config, scenario_config, seed: int) -> dict:
        t0 = time.time()
        cpu0 = time.process_time()
        sim = Simulator(
            num_runs=self.evaluation_config.num_runs,
            set_generator_factory=scenario_config.set_generator_factory,
            sketch_estimator_config=estimator_config,
            sketch_random_state=np.random.RandomState(seed),
            set_random_state=np.random.RandomState(seed + 1),
            spark=self.spark,
        )
        df, df_agg = sim()
        # colons (grid scenario names embed 'key:value' parts) break
        # Hadoop URI parsing on read-back; sanitize the PATH component only —
        # the true names travel as columns in the parquet itself
        cell_dir = os.path.join(
            self.out_dir,
            self.evaluation_config.name,
            f"estimator={_path_safe(estimator_config.name)}",
            f"scenario={_path_safe(scenario_config.name)}",
        )
        os.makedirs(cell_dir, exist_ok=True)
        df = df.copy()
        df["estimator"] = estimator_config.name
        df["scenario"] = scenario_config.name
        df.to_parquet(os.path.join(cell_dir, RAW_DF))
        flat = df_agg.copy()
        flat.columns = ["_".join(c) for c in flat.columns]
        flat.reset_index().to_parquet(os.path.join(cell_dir, AGG_DF))
        return {
            "estimator": estimator_config.name,
            "scenario": scenario_config.name,
            "wall_sec": time.time() - t0,
            "cpu_sec": time.process_time() - cpu0,
            "num_runs": self.evaluation_config.num_runs,
        }

    def __call__(self) -> list[dict]:
        seeds = self._scenario_seeds()
        grid = [
            (est, scen, seeds[scen.name])
            for est in self.estimator_configs
            for scen in self.evaluation_config.scenario_config_list
        ]
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            results = list(pool.map(lambda args: self._run_cell(*args), grid))
        run_dir = os.path.join(self.out_dir, self.evaluation_config.name)
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "metrics.json"), "w") as fh:
            json.dump(
                {
                    "config": self.evaluation_config.name,
                    "num_runs": self.evaluation_config.num_runs,
                    "cells": results,
                },
                fh,
                indent=2,
            )
        return results


def _path_safe(name: str) -> str:
    """Directory-safe twin of a config name (':' breaks Hadoop URIs)."""
    return name.replace(":", "~")


def read_results(spark, out_dir: str, evaluation_name: str):
    """Read all raw result parquet; estimator/scenario arrive as data
    columns written by the evaluator (directory names are sanitized twins —
    ref analogue: analyzer.py:177-201 read_evaluation_results)."""
    path = os.path.join(out_dir, evaluation_name)
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(path, "estimator=*", "scenario=*", RAW_DF))
    )
    return df
