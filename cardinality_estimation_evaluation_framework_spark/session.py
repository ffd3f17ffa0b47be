"""SparkSession factory tuned for the sketch workload.

Local mode here is a stand-in for a multi-executor cluster; every knob below
is the one you would set on a 1000-executor job reading 100 TB:

- AQE on (runtime shuffle coalescing + skew-join splitting),
- Arrow transport on (all Python kernels are vectorized pandas UDFs),
- shuffle partitions sized to cores (local) / 2-3x total cores (cluster),
- small broadcast threshold left at default so dimension joins broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ceef_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32. On a real cluster the
    master/resource args come from spark-submit; this factory only sets SQL
    conf that is safe either way.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # sketch states are small; keep maxRecordsPerBatch high so token
        # explode batches amortize Arrow transfer (measured best at 128k)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
