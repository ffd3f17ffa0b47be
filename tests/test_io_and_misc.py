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
    """When the real farmhash C extension is present, pin our pure-Python
    FarmHash64 bit-for-bit against it (ref hash path: hash_function.py:53-56).
    All register-parity tests (test_reference_parity.py) route BOTH sides
    through the pure-Python implementation, so they hold either way; this
    test additionally anchors that implementation to the C library."""
    fh = farmhash_or_none()
    if getattr(fh, "__is_pure_python_shim__", False):
        pytest.skip("only the pure-python shim is installed")
    from cardinality_estimation_evaluation_framework_spark import farmhash64

    rng = np.random.RandomState(0)
    samples = [str(int(x)) for x in rng.randint(0, 2**62, size=200)]
    samples += ["", "a", "abc", "x" * 16, "y" * 17, "z" * 32, "w" * 33,
                "q" * 64, "r" * 65, "s" * 200]
    for s in samples:
        assert farmhash64.hash64(s) == fh.hash64(s), s
        assert farmhash64.hash64_with_seed(s, 7) == fh.hash64withseed(s, 7), s
        if hasattr(fh, "hash32withseed"):
            assert farmhash64.hash32(s) == fh.hash32(s), s
            assert farmhash64.hash32_with_seed(s, 7) == fh.hash32withseed(s, 7), s


def test_pure_python_farmhash64_self_consistency():
    """Deterministic, seed-sensitive, all length paths covered (0-16, 17-32,
    33-64, >64) — runs regardless of the C library."""
    from cardinality_estimation_evaluation_framework_spark import farmhash64 as fh

    assert fh.hash64("") == fh.K2
    lens = [1, 3, 4, 7, 8, 15, 16, 17, 31, 32, 33, 63, 64, 65, 128, 200]
    vals = {fh.hash64("x" * n) for n in lens}
    assert len(vals) == len(lens)  # no collisions across length paths
    assert fh.hash64_with_seed("123", 1) != fh.hash64_with_seed("123", 2)
    assert fh.hash64_with_seed("123", 1) == fh.hash64_with_seed("123", 1)
    # uniform-ish spread: bit balance over a small sample
    bits = np.array(
        [bin(fh.hash64_with_seed(str(i), 9)).count("1") for i in range(500)]
    )
    assert 28 < bits.mean() < 36


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
