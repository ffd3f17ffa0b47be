"""Scalar/numeric helpers shared by kernels and estimators."""
