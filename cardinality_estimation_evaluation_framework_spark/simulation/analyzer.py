"""Analyzer: Spark DataFrame metrics over evaluation results.

Re-expresses ref: src/evaluations/analyzer.py as Spark ops over the
partitioned parquet written by the Evaluator:

- num_estimable_sets (ref: :74-114): groupBy(num_sets) over runs with the
  estimable predicate, then an ordered first-failure scan on the tiny
  aggregated frame,
- relative-error stats join (ref: :223-238): left join + groupBy agg,
- long-format conversion (ref: :315-369): unpivot via stack(),
- per-frequency diff (ref: :371-427): lag window over the tiny histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from cardinality_estimation_evaluation_framework_spark.simulation.simulator import (
    NUM_SETS,
    RELERR,
)


def num_estimable_sets(
    df: DataFrame,
    error_margin: float = 0.05,
    proportion_of_runs: float = 0.95,
    relative_error_col: str = RELERR + "1",
) -> int:
    """Largest n such that all 2..n prefixes are estimable
    (ref: analyzer.py:74-114)."""
    est = (
        df.where(F.col(NUM_SETS) > 1)
        .groupBy(NUM_SETS)
        .agg(
            (
                F.avg((F.abs(F.col(relative_error_col)) < error_margin).cast("double"))
                >= proportion_of_runs
            ).alias("is_estimable")
        )
        .orderBy(NUM_SETS)
        .collect()
    )
    result = 0
    for row in est:  # ordered first-failure scan on <= num_sets rows
        if row["is_estimable"]:
            result = row[NUM_SETS]
        else:
            break
    return result


def num_estimable_sets_df(
    results: DataFrame,
    error_margins: list[float] = (0.05,),
    proportions: list[float] = (0.95,),
    relative_error_col: str = RELERR + "1",
) -> DataFrame:
    """Per (estimator, scenario, margin, proportion) metric table
    (the reference's num_estimable_sets.csv shape)."""
    spark = results.sparkSession
    rows = []
    pairs = [
        (r["estimator"], r["scenario"])
        for r in results.select("estimator", "scenario").distinct().collect()
    ]
    for estimator, scenario in pairs:
        sub = results.where(
            (F.col("estimator") == estimator) & (F.col("scenario") == scenario)
        )
        for margin in error_margins:
            for prop in proportions:
                rows.append(
                    (
                        estimator,
                        scenario,
                        float(margin),
                        float(prop),
                        num_estimable_sets(sub, margin, prop, relative_error_col),
                    )
                )
    return spark.createDataFrame(
        rows,
        schema="sketch_estimator string, scenario string, error_margin double,"
        " proportion_of_runs double, num_estimable_sets long",
    )


def relative_error_stats_at_estimable(
    metric_df: DataFrame, raw_df: DataFrame, relative_error_col: str = RELERR + "1"
) -> DataFrame:
    """Left join metric table to raw runs at num_sets == num_estimable_sets,
    then mean/std (ref: analyzer.py:223-238)."""
    joined = metric_df.join(
        raw_df,
        on=(
            (metric_df.sketch_estimator == raw_df.estimator)
            & (metric_df.scenario == raw_df.scenario)
            & (metric_df.num_estimable_sets == raw_df[NUM_SETS])
        ),
        how="left",
    )
    return joined.groupBy(
        "error_margin", "proportion_of_runs", "sketch_estimator",
        metric_df.scenario, "num_estimable_sets",
    ).agg(
        F.avg(relative_error_col).alias("relative_error_mean"),
        F.stddev(relative_error_col).alias("relative_error_std"),
    )


def to_long_format(raw_df: DataFrame, max_freq: int) -> DataFrame:
    """Wide (estimated_cardinality_i / true_cardinality_i) → long
    (source, frequency_level, cardinality) via stack
    (ref: analyzer.py:315-369 melt + name split)."""
    pairs = []
    for i in range(1, max_freq + 1):
        pairs += [
            (f"'estimated' AS src_{i}e", f"estimated_cardinality_{i}"),
            (f"'true' AS src_{i}t", f"true_cardinality_{i}"),
        ]
    stack_args = []
    for i in range(1, max_freq + 1):
        stack_args.append(f"'estimated', {i}, estimated_cardinality_{i}")
        stack_args.append(f"'true', {i}, true_cardinality_{i}")
    expr = (
        f"stack({2 * max_freq}, "
        + ", ".join(stack_args)
        + ") as (source, frequency_level, cardinality)"
    )
    keep = [c for c in raw_df.columns if not c.startswith(("estimated_cardinality_", "true_cardinality_", "relative_error_"))]
    return raw_df.selectExpr(*keep, expr)


def per_frequency_cardinality(long_df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cumulative k+ histogram → per-level cardinality via lead-diff over a
    window (ref: analyzer.py:371-427 lag-1 diff, descending levels)."""
    w = Window.partitionBy(*group_cols, "source").orderBy("frequency_level")
    nxt = F.lead("cardinality").over(w)
    return long_df.withColumn(
        "per_frequency_cardinality",
        F.when(nxt.isNull(), F.col("cardinality")).otherwise(
            F.col("cardinality") - nxt
        ),
    )
