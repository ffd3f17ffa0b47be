import numpy as np
from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.sketches.hll import HllKernel


def _skewed(spark, hot=200_000, cold=5_000):
    """One source holds 97% of rows (hot key), 8 sources share the rest."""
    hot_df = spark.range(hot).select(
        F.lit("hot").alias("source"), F.col("id").alias("item")
    )
    cold_df = spark.range(cold).select(
        F.concat(F.lit("s"), (F.col("id") % 8).cast("string")).alias("source"),
        (F.col("id") + 1_000_000).alias("item"),
    )
    return hot_df.union(cold_df)


def test_grouped_sketch_under_skew(spark):
    """Map-side combine neutralizes value skew: correct per-key estimates
    without any salting, even with a 40:1 hot key."""
    df = _skewed(spark)
    k = HllKernel(p=12, seed=3)
    est = {
        r["source"]: r["estimate"]
        for r in agg.grouped_estimate(
            agg.grouped_sketch(df, k, ["source"], "item"), k, ["source"]
        ).collect()
    }
    assert abs(est["hot"] - 200_000) / 200_000 < 0.05
    for s in (f"s{i}" for i in range(8)):
        assert abs(est[s] - 625) / 625 < 0.15


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed(spark, hot=50_000, cold=1_000)
    salted = agg.salted_repartition(df, "source", salt_buckets=8, partitions=8)
    # hot key's rows must land on >1 partition
    counts = (
        salted.where(F.col("source") == "hot")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(counts) > 1, "hot key not spread"
    assert sum(r["count"] for r in counts) == 50_000  # nothing lost


def test_salted_exact_counts_match(spark):
    df = _skewed(spark, hot=30_000, cold=800)
    plain = {r["source"]: r["count"] for r in df.groupBy("source").count().collect()}
    salted = {
        r["source"]: r["count"]
        for r in agg.salted_exact_counts(df, "source", salt_buckets=8).collect()
    }
    assert plain == salted
