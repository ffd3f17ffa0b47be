"""Sketch kernels: mergeable, associative aggregation states.

Each kernel is pure numpy (vectorized, no per-row Python) and plugs into the
generic Spark partial+tree-merge harness in ``operators.aggregate``.
"""

from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    pack_state,
    unpack_state,
)

__all__ = ["SketchKernel", "pack_state", "unpack_state"]
