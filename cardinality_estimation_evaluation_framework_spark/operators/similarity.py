"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — JVM-side zip_with /
  aggregate arithmetic, one scan + window top-k (or threshold filter for
  deterministic output sets).
- LSH-bucketed ANN (random hyperplanes): the scale path — b seeded
  hyperplane signs → bucket key; query probes its bucket (+ optional
  multi-probe neighbors); candidates re-ranked exactly. Turns the O(N)
  scan into a bucket lookup; recall tested against brute force in pytest.
- IVF-style variant: k seeded centroids (deterministic kmeans-lite),
  partition-pruned by nearest-centroid assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from cardinality_estimation_evaluation_framework_spark.hashing import splitmix64


def _cosine(vec_col, query: list[float]):
    # all math in double: float32*float32 would drift from a double oracle
    v = F.transform(vec_col, lambda x: x.cast("double"))
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = F.aggregate(
        F.zip_with(v, qlit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (nrm * F.lit(qn))


def brute_force_topk(emb: DataFrame, query: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine, deterministic ordering (cosine DESC, id ASC).

    Plan: score -> ``orderBy().limit(k)``, which Spark executes as
    TakeOrderedAndProject (per-partition top-k + tiny driver merge) — no
    unpartitioned global window, so the plan survives a billion-row
    embedding table. The rank column is attached AFTER the limit, over the
    k surviving rows only."""
    scored = emb.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.round(_cosine(F.col(vec_col), query), 6).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    # rank over the k survivors only. pmod(vec_id,1) is a constant-0
    # partition key Catalyst can't fold away (a bare lit(0) is pruned to an
    # empty spec, which logs the single-partition warning); one group over
    # k rows is exactly the intent here.
    w = Window.partitionBy(F.pmod(F.col("vec_id"), F.lit(1))).orderBy(
        F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "cosine", "rank"
    )


def brute_force_threshold(emb: DataFrame, query: list[float], threshold: float,
                          id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All vectors with cosine >= threshold (deterministic set — the
    oracle-friendly form)."""
    return (
        emb.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.round(_cosine(F.col(vec_col), query), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# LSH (random hyperplane) ANN
# --------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-gaussian hyperplanes from splitmix64 bits
    (Box-Muller over uniform mantissas)."""
    n = dim * n_planes
    u1 = splitmix64(np.arange(n, dtype=np.uint64), seed).astype(np.float64) / 2.0**64
    u2 = splitmix64(np.arange(n, dtype=np.uint64), seed + 1).astype(np.float64) / 2.0**64
    u1 = np.clip(u1, 1e-12, 1.0)
    g = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_planes, dim)


def with_lsh_bucket(emb: DataFrame, n_planes: int = 12, seed: int = 7,
                    vec_col: str = "embedding") -> DataFrame:
    """Add a hyperplane-sign bucket column via one Arrow kernel (matrix
    multiply per batch)."""
    dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf("long")
    def bucket(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())
        signs = (mat @ planes.T) > 0
        powers = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series((signs @ powers).astype(np.int64))

    return emb.withColumn("lsh_bucket", bucket(F.col(vec_col)))


def lsh_topk(emb_with_bucket: DataFrame, query: list[float], k: int = 10,
             n_planes: int = 12, seed: int = 7, multiprobe: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ANN: probe the query's bucket (+ hamming-1 neighbors when
    multiprobe>0), re-rank exactly. Bucket filter partition-prunes when the
    table is written partitioned/bucketed by lsh_bucket."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    qb = int(((planes @ q) > 0) @ (1 << np.arange(n_planes, dtype=np.int64)))
    probes = [qb]
    if multiprobe:
        probes += [qb ^ (1 << i) for i in range(n_planes)]
    cands = emb_with_bucket.where(F.col("lsh_bucket").isin(probes))
    return brute_force_topk(cands, query, k, id_col, vec_col)


# --------------------------------------------------------------------------
# IVF-style coarse quantizer
# --------------------------------------------------------------------------

def ivf_assign(emb: DataFrame, n_centroids: int = 16, seed: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               sample_rows: int = 2048) -> tuple[DataFrame, np.ndarray]:
    """Deterministic IVF: centroids = seeded sample refined by 5 Lloyd
    iterations on the driver (coarse quantizer is small by design), then a
    vectorized nearest-centroid assignment. Returns (df + ivf_cell, centroids)."""
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in
         emb.select(vec_col).limit(sample_rows).collect()]
    )
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(5):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)

    @F.pandas_udf("int")
    def cell(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())
        d = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return emb.withColumn("ivf_cell", cell(F.col(vec_col))), cents


def ivf_topk(emb_with_cell: DataFrame, centroids: np.ndarray, query: list[float],
             k: int = 10, n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Search the n_probe nearest cells only, re-rank exactly."""
    q = np.asarray(query, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    cells = [int(c) for c in d.argsort()[:n_probe]]
    return brute_force_topk(
        emb_with_cell.where(F.col("ivf_cell").isin(cells)), query, k, id_col, vec_col
    )
