"""Control experiment for BENCH/BASELINE.md: how much CPU scaling does this
machine give to a PURE-JVM codegen aggregation with zero Python and zero
engine code? Establishes the environment ceiling against which the engine's
flagship scaling must be read.

Usage: python tools/scaling_control.py
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession, functions as F


def measure(cores: int, rows: int = 400_000_000, reps: int = 3) -> float:
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"control{cores}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = spark.range(rows, numPartitions=64)
    expr = F.sum(F.xxhash64("id") % 1_000_000)
    df.agg(expr).collect()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.agg(expr).collect()
        best = min(best, time.time() - t0)
    spark.stop()
    return rows / best


def main() -> None:
    out = {}
    for cores in (1, 4, 16):
        out[f"local[{cores}]_rows_per_sec"] = round(measure(cores))
    out["eff_1_to_4"] = round(out["local[4]_rows_per_sec"] / (4 * out["local[1]_rows_per_sec"]), 3)
    out["eff_4_to_16"] = round(out["local[16]_rows_per_sec"] / (4 * out["local[4]_rows_per_sec"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
