"""Headline benchmark: one JSON line with per-query seconds.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The headline metric is sketch-build throughput
(tokens/sec through the HLL partial+tree-merge pipeline on the hashed
tokenizer — the 100 TB production path); per-query wall times cover the
other operator families.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.datagen import tokens as tk
from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.session import get_spark
from cardinality_estimation_evaluation_framework_spark.sketches.hll import HllKernel

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    spark = get_spark("ceef-bench", cores=CPUS)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks_df = agg.explode_tokens(tk.tokenize_hashed(docs)).cache()
    n_tokens = toks_df.count()  # materialize cache; token volume for throughput

    queries: dict[str, float] = {}

    # q1: flagship — distributed HLL++ sketch build over all tokens
    k = HllKernel(p=14, seed=42)
    sec, state = timed(lambda: agg.sketch(toks_df, k))
    queries["hll_build"] = sec
    hll_est = k.estimate(state)[0]
    tokens_per_sec = n_tokens / sec if sec > 0 else 0.0

    # q2: grouped HLL per source
    tok_src = tk.tokenize_hashed(docs).select(
        "source", F.explode("tokens").alias("_t")
    ).select("source", F.col("_t").cast("long").alias("item"))
    sec, _ = timed(
        lambda: agg.grouped_estimate(
            agg.grouped_sketch(tok_src, HllKernel(p=12, seed=7), ["source"], "item"),
            HllKernel(p=12, seed=7),
            ["source"],
        ).collect()
    )
    queries["hll_by_source"] = sec

    # q3: exact reach per source (shuffle-heavy baseline for comparison)
    sec, _ = timed(
        lambda: tok_src.groupBy("source")
        .agg(F.countDistinct("item").alias("reach"))
        .collect()
    )
    queries["exact_reach_by_source"] = sec

    # q4: token frequency histogram (two-level agg)
    sec, _ = timed(
        lambda: toks_df.groupBy("item")
        .count()
        .groupBy("count")
        .count()
        .collect()
    )
    queries["token_freq_hist"] = sec

    # q5: spark-native approx_count_distinct cross-check (JVM HLL baseline)
    sec, native = timed(
        lambda: toks_df.agg(F.approx_count_distinct("item", 0.01).alias("d")).collect()
    )
    queries["native_approx_distinct"] = sec

    total = sum(queries.values())
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k_: round(v, 3) for k_, v in queries.items()},
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "tokens": n_tokens,
                "tokens_per_sec_hll_build": round(tokens_per_sec),
                "hll_estimate": round(hll_est),
                "native_estimate": int(native[0]["d"]),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
