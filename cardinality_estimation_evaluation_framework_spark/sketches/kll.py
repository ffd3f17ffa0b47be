"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016) — north-rule extra.

Not in the reference (which has no quantile operators); implemented from the
published algorithm (see also KLL± , VLDB 2021, in PAPERS.md). Guarantee:
rank error <= eps * n with eps ~= C / k (C ~ 2.3 for the 2/3-capacity
schedule used here, conservatively tested at 3/k).

State: a list of per-level buffers; level h items carry weight 2^h.
- update: append to level 0; compact any level over capacity by sorting and
  keeping every other element (random parity), promoting to level h+1.
- merge: level-wise concatenation then the same compaction sweep —
  associative in distribution; exact register equality across partitionings
  is NOT guaranteed (compaction is sampling), so tests assert rank-error
  bounds rather than bit-equality, matching the algorithm's contract.

Determinism: the compaction parity comes from a counter-seeded splitmix64,
so a fixed partitioning + fixed seed reproduces results exactly.

Serialization packs levels as one value array + level-offset array.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from cardinality_estimation_evaluation_framework_spark.hashing import splitmix64
from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)


def _capacity(k: int, depth_from_top: int) -> int:
    return max(2, int(np.ceil(k * (2.0 / 3.0) ** depth_from_top)))


class KllKernel(SketchKernel):
    input_dtype = "float64"

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = k
        self.seed = seed

    def spec(self) -> dict[str, Any]:
        return {"type": "kll", "k": self.k, "seed": self.seed}

    def empty(self) -> State:
        return {
            "values": np.zeros(0, dtype=np.float64),
            "offsets": np.zeros(1, dtype=np.int64),  # level h = values[off[h]:off[h+1]]
            "n": np.zeros(1, dtype=np.int64),
            "coin": np.zeros(1, dtype=np.int64),  # compaction counter (rng stream)
        }

    # -- internal list-of-arrays view ---------------------------------------
    @staticmethod
    def _levels(state: State) -> list[np.ndarray]:
        off = state["offsets"]
        return [state["values"][off[i]:off[i + 1]] for i in range(len(off) - 1)]

    @staticmethod
    def _store(state: State, levels: list[np.ndarray]) -> State:
        while len(levels) > 1 and len(levels[-1]) == 0:
            levels.pop()
        state["values"] = (
            np.concatenate(levels) if levels else np.zeros(0, dtype=np.float64)
        )
        state["offsets"] = np.concatenate(
            ([0], np.cumsum([len(lv) for lv in levels]))
        ).astype(np.int64)
        return state

    def _parity(self, state: State) -> int:
        c = int(state["coin"][0])
        state["coin"][0] = c + 1
        return int(splitmix64(np.array([c], dtype=np.uint64), self.seed)[0]) & 1

    def _compress(self, state: State, levels: list[np.ndarray]) -> list[np.ndarray]:
        h = 0
        while h < len(levels):
            cap = _capacity(self.k, max(0, len(levels) - 1 - h))
            if len(levels[h]) > cap:
                buf = np.sort(levels[h])
                parity = self._parity(state)
                promoted = buf[parity::2]
                levels[h] = np.zeros(0, dtype=np.float64)
                if h + 1 == len(levels):
                    levels.append(promoted)
                else:
                    levels[h + 1] = np.concatenate((levels[h + 1], promoted))
                # capacities shrink for lower levels as the tree grows; re-check from 0
                h = 0
                continue
            h += 1
        return levels

    def update(self, state: State, values: np.ndarray) -> State:
        if len(values) == 0:
            return state
        levels = self._levels(state)
        if not levels:
            levels = [np.zeros(0, dtype=np.float64)]
        vals = values.astype(np.float64)
        state["n"][0] += len(vals)
        # ingest in capacity-sized chunks so level-0 never balloons
        chunk = max(self.k, 64)
        for i in range(0, len(vals), chunk):
            levels[0] = np.concatenate((levels[0], vals[i : i + chunk]))
            levels = self._compress(state, levels)
        return self._store(state, levels)

    def merge(self, a: State, b: State) -> State:
        la, lb = self._levels(a), self._levels(b)
        depth = max(len(la), len(lb))
        levels = []
        for h in range(depth):
            xs = la[h] if h < len(la) else np.zeros(0)
            ys = lb[h] if h < len(lb) else np.zeros(0)
            levels.append(np.concatenate((xs, ys)).astype(np.float64))
        out = self.empty()
        out["n"][0] = a["n"][0] + b["n"][0]
        out["coin"][0] = a["coin"][0] + b["coin"][0]
        levels = self._compress(out, levels if levels else [np.zeros(0)])
        return self._store(out, levels)

    # -- queries -------------------------------------------------------------
    def quantile(self, state: State, q: float | np.ndarray) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        levels = self._levels(state)
        vals = np.concatenate([lv for lv in levels]) if levels else np.zeros(0)
        if len(vals) == 0:
            return np.full(len(qs), np.nan)
        weights = np.concatenate(
            [np.full(len(lv), 2.0**h) for h, lv in enumerate(levels)]
        )
        order = np.argsort(vals, kind="stable")
        sv, sw = vals[order], weights[order]
        cum = np.cumsum(sw)
        total = cum[-1]
        ranks = np.clip(qs, 0, 1) * total
        idx = np.searchsorted(cum, ranks, side="left")
        return sv[np.minimum(idx, len(sv) - 1)]

    def rank(self, state: State, x: float) -> float:
        """Approximate normalized rank of x."""
        levels = self._levels(state)
        num = 0.0
        den = 0.0
        for h, lv in enumerate(levels):
            w = 2.0**h
            num += w * np.count_nonzero(lv <= x)
            den += w * len(lv)
        return num / den if den else float("nan")

    def estimate(self, state: State) -> list[float]:
        """Median (headline scalar); use quantile() for arbitrary q."""
        return [float(self.quantile(state, 0.5)[0])]

    def eps(self) -> float:
        """Conservative rank-error bound for tests."""
        return 3.0 / self.k
