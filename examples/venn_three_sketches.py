"""Three-way audience overlap from LiquidLegions sketches — a capability
the reference leaves NotImplemented (its VennEstimator/Sampler raise for
k >= 3; see /root/reference/src/estimators/liquid_legions.py:361-369).

Each "publisher" builds ONE sketch over its own ids (here: driver-side
kernels for brevity — the distributed build is
`agg.sketch(df, LiquidLegionsKernel(...))` and produces the identical
state). The Venn estimator then reads every region of the 3-set diagram
from just the three O(m) states:

    python examples/venn_three_sketches.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cardinality_estimation_evaluation_framework_spark.sketches.liquid_legions import (
    LiquidLegionsKernel,
    VennEstimator,
)

REGIONS = {
    1: "A only", 2: "B only", 3: "A∩B only",
    4: "C only", 5: "A∩C only", 6: "B∩C only", 7: "A∩B∩C",
}


def main() -> None:
    k = LiquidLegionsKernel(a=10.0, m=200_000, seed=7)
    A = np.arange(0, 30_000, dtype=np.int64)
    B = np.arange(20_000, 50_000, dtype=np.int64)
    C = np.arange(25_000, 65_000, dtype=np.int64)
    states = [k.update(k.empty(), s) for s in (A, B, C)]

    venn = VennEstimator(k, states)()
    sets = {"A": set(A.tolist()), "B": set(B.tolist()), "C": set(C.tolist())}
    print(f"{'region':>10} {'estimate':>10} {'truth':>8}")
    for region in range(1, 8):
        members = [s for i, s in enumerate("ABC") if region >> i & 1]
        others = [s for s in "ABC" if s not in members]
        true = set.intersection(*(sets[s] for s in members))
        for o in others:
            true -= sets[o]
        print(f"{REGIONS[region]:>10} {venn[region]:>10.0f} {len(true):>8}")
    print(f"{'union':>10} {venn[1:].sum():>10.0f} "
          f"{len(sets['A'] | sets['B'] | sets['C']):>8}")


if __name__ == "__main__":
    main()
