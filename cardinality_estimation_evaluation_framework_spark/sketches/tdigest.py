"""t-digest (Dunning & Ertl, "Computing Extremely Accurate Quantiles Using
t-Digests", 2019) — north-rule extra; not in the reference.

Merging-digest variant: state is a sorted centroid list (mean, weight);
ingest buffers points as weight-1 centroids and compresses; merge
concatenates centroid lists and compresses. The k1 scale function
k(q) = (delta / 2pi) * asin(2q - 1) bounds centroid q-spans so tail
quantiles stay accurate. Deterministic: compression processes centroids in
sorted order with no randomness, so a fixed partitioning reproduces exactly;
cross-partitioning equality is approximate (tested via quantile bounds).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from cardinality_estimation_evaluation_framework_spark.sketches.base import (
    SketchKernel,
    State,
)


class TDigestKernel(SketchKernel):
    input_dtype = "float64"

    def __init__(self, delta: float = 200.0):
        self.delta = delta

    def spec(self) -> dict[str, Any]:
        return {"type": "tdigest", "delta": self.delta}

    def empty(self) -> State:
        return {
            "means": np.zeros(0, dtype=np.float64),
            "weights": np.zeros(0, dtype=np.float64),
        }

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> State:
        if len(means) == 0:
            return {"means": means, "weights": weights}
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        q0 = 0.0
        k0 = float(self._k(np.array([0.0]))[0])
        for m, w in zip(means[1:], weights[1:]):
            q_new = q0 + (cur_w + w) / total
            if float(self._k(np.array([q_new]))[0]) - k0 <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                k0 = float(self._k(np.array([q0]))[0])
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        return {
            "means": np.asarray(out_m, dtype=np.float64),
            "weights": np.asarray(out_w, dtype=np.float64),
        }

    def update(self, state: State, values: np.ndarray) -> State:
        if len(values) == 0:
            return state
        vals = values.astype(np.float64)
        # pre-cluster the batch: sort and bucket to ~4*delta micro-centroids
        # so compression cost is O(batch log batch) and state stays small
        vals.sort()
        n_bins = int(4 * self.delta)
        if len(vals) > n_bins:
            splits = np.array_split(vals, n_bins)
            bm = np.array([c.mean() for c in splits if len(c)])
            bw = np.array([float(len(c)) for c in splits if len(c)])
        else:
            bm, bw = vals, np.ones(len(vals))
        merged = self._compress(
            np.concatenate((state["means"], bm)),
            np.concatenate((state["weights"], bw)),
        )
        state.update(merged)
        return state

    def merge(self, a: State, b: State) -> State:
        return self._compress(
            np.concatenate((a["means"], b["means"])),
            np.concatenate((a["weights"], b["weights"])),
        )

    def quantile(self, state: State, q: float | np.ndarray) -> np.ndarray:
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        m, w = state["means"], state["weights"]
        if len(m) == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(w) - w / 2  # centroid centers in cumulative weight
        targets = np.clip(qs, 0, 1) * w.sum()
        return np.interp(targets, cum, m)

    def estimate(self, state: State) -> list[float]:
        return [float(self.quantile(state, 0.5)[0])]
