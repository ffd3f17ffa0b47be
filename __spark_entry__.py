"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` pairs are the correctness gate: each Spark
pipeline is compared value-for-value against an independent DuckDB run at
sf=0.01. Sketch pipelines are verified through *portable-hash register
tables* (exact integer outputs reproducible in ANSI SQL), which proves the
whole mapInPandas partial + tree-merge machinery, not just the formulas.
Float estimates (HLL alpha formula etc.) are covered by pytest bounds
instead, since cross-engine float summation is not bit-stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from cardinality_estimation_evaluation_framework_spark.datagen import tokens as tk
from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.sketches.hll import (
    PortableHllKernel,
)

_PORTABLE_HLL = dict(p=10, a=1103515245, b=12345)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_reach_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token reach (ExactMultiSet analogue, ref: exact_set.py:44-58)."""
    toks = tk.tokens_exploded(_docs(spark, sf_dir))
    return toks.groupBy("source").agg(F.countDistinct("tok").alias("reach"))


def q_token_freq_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency histogram of token occurrence counts (LosslessEstimator input,
    ref: exact_set.py:69-98)."""
    toks = tk.tokens_exploded(_docs(spark, sf_dir))
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    return freq.groupBy("freq").agg(F.count("*").alias("n_toks"))


def q_kplus_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative k+ reach histogram, k=1..10 — the reference's estimator
    output format h[i] = #tokens with freq >= i+1 (ref: base.py:53-69)."""
    toks = tk.tokens_exploded(_docs(spark, sf_dir))
    freq = toks.groupBy("tok").agg(F.count("*").alias("freq"))
    hist = freq.groupBy("freq").agg(F.count("*").alias("cnt"))
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    return (
        hist.join(ks, hist.freq >= ks.k)
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("kplus_reach"))
    )


def q_hll_register_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-hash HLL register table built by the DISTRIBUTED kernel
    (mapInPandas partials + tree merge), emitted as (bucket, rho) rows.

    The DuckDB oracle recomputes the registers in pure SQL, so equality here
    verifies hashing, bucketing, rho computation, partial aggregation and
    merge associativity end-to-end (ref semantics: hyper_log_log.py:157-246).
    """
    kernel = PortableHllKernel(**_PORTABLE_HLL)
    tids = tk.token_ids_exploded(_docs(spark, sf_dir)).select(
        F.col("tid").alias("item")
    )
    state = agg.sketch(tids, kernel)
    regs = state["registers"]
    rows = [
        Row(bucket=int(i), rho=int(r)) for i, r in enumerate(regs.tolist()) if r > 0
    ]
    return spark.createDataFrame(rows, schema="bucket int, rho int")


def q_doc_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analyzer-style groupBy agg (ref: simulator.py:75-83 mean/std pattern)."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.avg("n_chars").alias("avg_chars"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed portable-HLL register table on sf0.001."""
    return q_hll_register_table(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "reach_by_source": q_reach_by_source,
        "token_freq_hist": q_token_freq_hist,
        "kplus_reach": q_kplus_reach,
        "hll_register_table": q_hll_register_table,
        "doc_stats_by_source": q_doc_stats_by_source,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    toks = f"WITH {tk.TOKENS_CTE_DUCKDB}"
    vocab = f"WITH {tk.TOKENS_CTE_DUCKDB}, {tk.VOCAB_CTE_DUCKDB}"
    hll = PortableHllKernel(**_PORTABLE_HLL)
    return {
        "reach_by_source": (
            f"{toks} SELECT source, count(DISTINCT tok) AS reach "
            "FROM toks GROUP BY source"
        ),
        "token_freq_hist": (
            f"{toks} SELECT freq, count(*) AS n_toks FROM ("
            "  SELECT tok, count(*) AS freq FROM toks GROUP BY tok"
            ") GROUP BY freq"
        ),
        "kplus_reach": (
            f"{toks}, hist AS ("
            "  SELECT freq, count(*) AS cnt FROM ("
            "    SELECT tok, count(*) AS freq FROM toks GROUP BY tok"
            "  ) GROUP BY freq)"
            " SELECT gs.k, CAST(sum(hist.cnt) AS BIGINT) AS kplus_reach"
            " FROM generate_series(1, 10) gs(k) JOIN hist ON hist.freq >= gs.k"
            " GROUP BY gs.k"
        ),
        "hll_register_table": (
            f"{vocab} SELECT bucket, max(rho) AS rho FROM ("
            f"  SELECT {hll.register_sql('tid')} FROM vocab"
            ") GROUP BY bucket"
        ),
        "doc_stats_by_source": (
            "SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "avg(n_chars) AS avg_chars FROM documents GROUP BY source"
        ),
    }
