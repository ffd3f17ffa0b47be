"""Local/global DP noise + denoise operators (ref: bloom_filters.py:487-631,
common/noisers.py, estimator_noisers.py, exact_set.py:116-133)."""
