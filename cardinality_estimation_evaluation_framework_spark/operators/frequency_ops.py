"""Heavy-hitter extraction over token/item streams — training-pipeline
staple (vocabulary pruning, boilerplate detection, stop-token lists).

- exact top-k: one counted groupBy + deterministic top-k (freq DESC, item
  ASC tie-break) — the oracle-friendly form.
- count-min filtered: the sketch form for streams where a full
  (item, count) table is unwanted. Pass 1 builds the O(KB) count-min
  state; pass 2 filters DISTINCT items by the broadcast sketch's point
  estimate >= phi*N. Count-min never undercounts, so every true heavy
  hitter survives (no false negatives); false positives are bounded by
  the eps*N overcount. Both passes are shuffle-light: the CM build is a
  map-side-combined groupBy of register rows; the filter is a distinct +
  an Arrow map over it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from cardinality_estimation_evaluation_framework_spark.operators import (
    aggregate as agg,
)
from cardinality_estimation_evaluation_framework_spark.sketches.countmin import (
    CountMinKernel,
)


def heavy_hitters_exact(items: DataFrame, k: int = 20,
                        col: str = "item") -> DataFrame:
    """(item, cnt, rank) — exact top-k by count, deterministic ordering
    (cnt DESC, item ASC), ANSI-SQL-expressible for the oracle gate.

    Plan: counted groupBy -> ``orderBy().limit(k)``, which Spark executes
    as TakeOrderedAndProject (per-partition top-k + tiny driver merge) —
    no global-window single-partition stage even with a billion distinct
    items. The rank column is attached AFTER the limit (k rows)."""
    counts = items.groupBy(col).agg(F.count("*").alias("cnt"))
    top = counts.orderBy(F.desc("cnt"), F.asc(col)).limit(k)
    # rank over the k survivors only. pmod(cnt,1) is a constant-0 partition
    # key Catalyst can't fold away (bare literals — and cnt*0, since count
    # is non-nullable — are pruned to an empty spec, which logs the
    # single-partition warning); one group over k rows is the intent.
    w = Window.partitionBy(F.pmod(F.col("cnt"), F.lit(1))).orderBy(
        F.desc("cnt"), F.asc(col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        F.col(col).alias("item"), "cnt", "rank"
    )


def heavy_hitters_countmin(items: DataFrame, phi: float = 0.001,
                           width: int = 8192, depth: int = 4, seed: int = 0,
                           col: str = "item") -> DataFrame:
    """(item, est_cnt) — items whose count-min estimate >= phi * N.

    Guarantee: contains EVERY item with true count >= phi*N (count-min
    only overcounts); may add items whose true count >= phi*N - eps*N.
    The sketch state is built distributed (partial + tree merge), then
    broadcast via closure into one Arrow pass over the distinct items.
    """
    kernel = CountMinKernel(width=width, depth=depth, seed=seed)
    state = agg.sketch(items, kernel, col=col)
    n = int(state["n"][0])
    threshold = phi * n
    table = state["table"]

    def filter_batch(batches):
        for pdf in batches:
            vals = pdf[col].to_numpy(dtype=np.int64)
            est = kernel.query({"table": table, "n": state["n"]}, vals)
            keep = est >= threshold
            yield pd.DataFrame({"item": vals[keep], "est_cnt": est[keep]})

    distinct = items.select(col).distinct()
    return distinct.mapInPandas(filter_batch, schema="item long, est_cnt long")
