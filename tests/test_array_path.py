import numpy as np
from pyspark.sql import functions as F

from cardinality_estimation_evaluation_framework_spark.operators import aggregate as agg
from cardinality_estimation_evaluation_framework_spark.sketches.hll import HllKernel


def _docs(spark, n_docs=5_000):
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(2**31 - 1)).cast("int"),
    )
    return spark.range(n_docs, numPartitions=8).select(toks.alias("tokens"))


def test_array_path_matches_explode_path(spark):
    docs = _docs(spark)
    k = HllKernel(p=12, seed=3)
    via_explode = agg.sketch(agg.explode_tokens(docs), k)
    via_arrays = agg.sketch_tokens(docs, k)
    assert (via_explode["registers"] == via_arrays["registers"]).all()


def test_array_path_handles_nulls_and_empties(spark):
    df = spark.createDataFrame(
        [([1, 2, 3],), (None,), ([],), ([4],)],
        "tokens array<int>",
    )
    k = HllKernel(p=10, seed=1)
    st = agg.sketch_tokens(df, k)
    exact = k.update(k.empty(), np.array([1, 2, 3, 4], dtype=np.int64))
    assert (st["registers"] == exact["registers"]).all()
