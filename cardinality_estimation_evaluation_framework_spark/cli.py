"""Evaluation CLI: evaluate -> analyze -> report (the reference's
wfa-run-evaluation re-expressed for Spark; ref: run_evaluation.py:36-198).

Invoke via `ceef-run-evaluation` (console script) or
`spark-submit --py-files dist/ceef_spark.zip jobs/run_evaluation.py ...`.
"""

from __future__ import annotations

import argparse
import os

from cardinality_estimation_evaluation_framework_spark.session import get_spark
from cardinality_estimation_evaluation_framework_spark.simulation import analyzer
from cardinality_estimation_evaluation_framework_spark.simulation.configs import (
    EVALUATION_CONFIGS,
)
from cardinality_estimation_evaluation_framework_spark.simulation.estimators import (
    ESTIMATOR_CONFIGS,
    get_estimator_configs,
)
from cardinality_estimation_evaluation_framework_spark.simulation import report
from cardinality_estimation_evaluation_framework_spark.simulation.evaluator import (
    Evaluator,
    read_results,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--evaluation_config", default="smoke_test",
                   choices=sorted(EVALUATION_CONFIGS))
    p.add_argument("--sketch_estimator_configs", nargs="+",
                   default=["exact", "exp_adbf"],
                   help="short registry names (e.g. exp_adbf) or full "
                        "reference-grammar names from the config grids "
                        "(e.g. exp_bloom_filter-100000_10-first_moment_exp-"
                        "no_local_dp-no_global_dp)")
    p.add_argument("--run_name", default="run")
    p.add_argument("--num_runs", type=int, default=100)
    p.add_argument("--universe_size", type=int, default=None)
    p.add_argument("--num_sets", type=int, default=None)
    p.add_argument("--set_size", type=int, default=None)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--analysis_out_dir", default=None)
    p.add_argument("--error_margin", type=float, nargs="+", default=[0.05])
    p.add_argument("--proportion_of_runs", type=float, nargs="+", default=[0.95])
    p.add_argument("--analysis_type", choices=["cardinality", "frequency"],
                   default="cardinality",
                   help="frequency analyzes the max_frequency-th k+ level")
    p.add_argument("--max_frequency", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--random_seed", type=int, default=42)
    p.add_argument("--cores", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    spark = get_spark(f"ceef-eval-{args.run_name}", cores=args.cores)

    cfg_kwargs = {"num_runs": args.num_runs}
    for k in ("universe_size", "num_sets", "set_size"):
        if getattr(args, k) is not None:
            cfg_kwargs[k] = getattr(args, k)
    evaluation_config = EVALUATION_CONFIGS[args.evaluation_config](**cfg_kwargs)
    # short registry names resolve through ESTIMATOR_CONFIGS; anything else
    # is looked up in the full reference-grammar registries
    # (ref: evaluation_configs.py:1730-1762)
    short = [n for n in args.sketch_estimator_configs if n in ESTIMATOR_CONFIGS]
    full = [n for n in args.sketch_estimator_configs if n not in ESTIMATOR_CONFIGS]
    overrides = {}
    if args.max_frequency > 1:
        for n in short:
            if n in ("exact", "less_one", "fll", "ska"):
                overrides[n] = {"max_frequency": args.max_frequency}
    estimator_configs = get_estimator_configs(short, **overrides)
    if full:
        from cardinality_estimation_evaluation_framework_spark.simulation.config_grids import (
            get_estimator_configs_by_name,
        )

        estimator_configs += get_estimator_configs_by_name(
            full, max_frequency=max(args.max_frequency, 2))

    out_dir = os.path.join(args.out_dir, args.run_name)
    print(f"[evaluate] {evaluation_config.name}: "
          f"{len(estimator_configs)} estimators x "
          f"{len(evaluation_config.scenario_config_list)} scenarios x "
          f"{args.num_runs} runs -> {out_dir}")
    cells = Evaluator(
        evaluation_config, estimator_configs, out_dir,
        workers=args.workers, random_seed=args.random_seed,
    )()
    for c in cells:
        print(f"  {c['estimator']} / {c['scenario']}: {c['wall_sec']:.1f}s")

    print("[analyze]")
    results = read_results(spark, out_dir, evaluation_config.name)
    # cardinality analyzes relative_error_1; frequency analyzes shuffle
    # distance (ref: analyzer.py:275-288, criteria doc: 20% shuffle distance
    # for 80% of runs)
    if args.analysis_type == "cardinality":
        err_col = "relative_error_1"
        margins, props = args.error_margin, args.proportion_of_runs
    else:
        err_col = "shuffle_distance"
        margins = args.error_margin if args.error_margin != [0.05] else [0.2]
        props = args.proportion_of_runs if args.proportion_of_runs != [0.95] else [0.8]
    metric = analyzer.num_estimable_sets_df(
        results,
        error_margins=margins,
        proportions=props,
        relative_error_col=err_col,
    )
    analysis_dir = args.analysis_out_dir or os.path.join(out_dir, "analysis")
    os.makedirs(analysis_dir, exist_ok=True)
    pdf = metric.toPandas().sort_values(["sketch_estimator", "scenario"])
    csv_path = os.path.join(analysis_dir, "num_estimable_sets.csv")
    pdf.to_csv(csv_path, index=False)
    print(pdf.to_string(index=False))

    stats_pdf = analyzer.relative_error_stats_at_estimable(metric, results).toPandas()
    html_path = report.generate_html_report(
        pdf, stats_pdf, analysis_dir,
        title=f"{evaluation_config.name} ({args.num_runs} runs)",
    )
    if args.analysis_type == "frequency" and args.max_frequency > 1:
        # per-frequency distribution plot per estimator (the reference's
        # FrequencyEstimatorEvaluationAnalyzer._save_plot_frequency_
        # distribution_for_report): wide -> long -> per-level diff -> barplot.
        # Mixed runs may include cardinality-only estimators whose cells
        # carry only *_1 columns — analyze up to the deepest level every
        # cell actually has.
        avail = max(
            (int(c.rsplit("_", 1)[1]) for c in results.columns
             if c.startswith("estimated_cardinality_")),
            default=1,
        )
        long_df = analyzer.to_long_format(
            results, max_freq=min(args.max_frequency, avail))
        per_freq = analyzer.per_frequency_cardinality(
            long_df, ["estimator", "scenario", "run_index", "num_sets"]
        ).toPandas()
        per_freq = per_freq.rename(
            columns={"per_frequency_cardinality": "cardinality_per_level"})
        per_freq.to_csv(
            os.path.join(analysis_dir, "per_frequency_cardinality.csv"),
            index=False)
        for est_name, sub in per_freq.groupby("estimator"):
            safe = est_name.replace("/", "_")
            report.barplot_frequency_distributions(
                sub.rename(columns={"cardinality_per_level": "cardinality"}),
                os.path.join(analysis_dir, f"freq_dist_{safe}.png"),
            )
    print(f"[report] wrote {csv_path} and {html_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
