import numpy as np
import pytest

from cardinality_estimation_evaluation_framework_spark.hashing import farmhash_or_none
from cardinality_estimation_evaluation_framework_spark.simulation.report import (
    generate_html_report,
    parse_estimator_name,
    widen_num_estimable_sets,
)
from cardinality_estimation_evaluation_framework_spark.sources.io import (
    read_table,
    write_table,
)


def test_io_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100)
    write_table(df, str(tmp_path / "t"), mode="overwrite")
    back = read_table(spark, str(tmp_path / "t"))
    assert back.count() == 100


def test_io_iceberg_clear_error(spark):
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        read_table(spark, "iceberg:cat.db.tokens")


@pytest.mark.skipif(farmhash_or_none() is None, reason="farmhash not installed")
def test_farmhash_bit_parity():
    """When the real farmhash is present, pin bit-parity with the reference's
    hashing convention (ref: hash_function.py:53-56)."""
    fh = farmhash_or_none()
    assert fh.hash64withseed(str(123), 7) == fh.hash64withseed("123", 7)


def test_report_generation(tmp_path):
    import pandas as pd

    metric = pd.DataFrame(
        {
            "sketch_estimator": ["a-1-e-n-n", "a-1-e-n-n", "b-2-f-n-n", "b-2-f-n-n"],
            "scenario": ["s1", "s2", "s1", "s2"],
            "error_margin": [0.05] * 4,
            "proportion_of_runs": [0.95] * 4,
            "num_estimable_sets": [20, 18, 5, 2],
        }
    )
    wide = widen_num_estimable_sets(metric)
    assert wide.loc["a-1-e-n-n", "s1"] == 20
    parsed = parse_estimator_name("exp_bloom_filter-1e5_10-first_moment_exp-no_local_dp-no_global_dp")
    assert parsed["sketch"] == "exp_bloom_filter"
    assert parsed["estimator"] == "first_moment_exp"
    path = generate_html_report(metric, None, str(tmp_path))
    html = open(path).read()
    assert "Number of estimable sets" in html and "20" in html
