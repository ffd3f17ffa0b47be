"""Sketch kernel protocol + binary state transport.

The reference models a sketch as an object with ``add/add_ids`` and
``merge`` (ref: src/estimators/base.py:17-50). Here a sketch is split into

- a *kernel*: stateless config + pure numpy functions over a *state*
  (dict of numpy arrays), and
- a *state*: the aggregation buffer that flows through Spark as a single
  ``binary`` column (self-describing: config header + arrays).

This split is what makes sketches Spark-native: the state is a tiny,
fixed-size, associatively-mergeable value, so partial aggregation per
partition + tree merge gives the same answer for any partitioning — the
property the reference asserts via ``assert_compatible`` + commutative
merges (ref: any_sketch.py:36-105,396-404).
"""

from __future__ import annotations

import io
import json
from abc import ABC, abstractmethod
from typing import Any

import numpy as np

State = dict[str, np.ndarray]

_MAGIC = b"CEEF1"


def pack_state(spec: dict[str, Any], state: State) -> bytes:
    """Serialize spec + named arrays to self-describing bytes.

    The spec header travels with every partial so merge kernels can enforce
    compatibility exactly where the reference does (merge time).
    """
    buf = io.BytesIO()
    header = json.dumps(spec, sort_keys=True).encode()
    buf.write(_MAGIC)
    buf.write(len(header).to_bytes(4, "little"))
    buf.write(header)
    names = sorted(state)
    buf.write(len(names).to_bytes(4, "little"))
    for name in names:
        nb = name.encode()
        buf.write(len(nb).to_bytes(2, "little"))
        buf.write(nb)
        np.save(buf, np.ascontiguousarray(state[name]), allow_pickle=False)
    return buf.getvalue()


def unpack_state(raw: bytes) -> tuple[dict[str, Any], State]:
    buf = io.BytesIO(raw)
    if buf.read(5) != _MAGIC:
        raise ValueError("not a packed sketch state")
    hlen = int.from_bytes(buf.read(4), "little")
    spec = json.loads(buf.read(hlen).decode())
    n = int.from_bytes(buf.read(4), "little")
    state: State = {}
    for _ in range(n):
        nlen = int.from_bytes(buf.read(2), "little")
        name = buf.read(nlen).decode()
        state[name] = np.load(buf, allow_pickle=False)
    return spec, state


class SketchKernel(ABC):
    """Config + pure functions over a mergeable state.

    ``update`` consumes a numpy int64 array of item ids (strings are hashed
    to int64 JVM-side via xxhash64 before reaching Python; integer columns
    pass through raw). All hashing/seeding beyond that is the kernel's job,
    vectorized.
    """

    #: associative & commutative merge? Order-dependent estimators
    #: (VoC pairwise, LiquidLegions sequential) set False and are folded
    #: on the driver in canonical order (SURVEY §4 note).
    associative: bool = True

    #: numpy dtype update() expects: "int64" for id sketches (strings are
    #: xxhash64'd JVM-side), "float64" for value sketches (quantiles).
    input_dtype: str = "int64"

    @abstractmethod
    def spec(self) -> dict[str, Any]:
        """JSON-able config; equality defines merge compatibility."""

    @abstractmethod
    def empty(self) -> State:
        ...

    @abstractmethod
    def update(self, state: State, values: np.ndarray) -> State:
        """Fold a batch of int64 ids into state. May mutate and return state."""

    @abstractmethod
    def merge(self, a: State, b: State) -> State:
        ...

    def estimate(self, state: State) -> list[float]:
        """Cardinality / k+-frequency histogram estimate (driver-side)."""
        raise NotImplementedError

    # --- transport helpers -------------------------------------------------
    def pack(self, state: State) -> bytes:
        return pack_state(self.spec(), state)

    def unpack(self, raw: bytes) -> State:
        spec, state = unpack_state(raw)
        mine = self.spec()
        if spec != mine:
            raise AssertionError(f"incompatible sketch states: {spec} != {mine}")
        return state

    def merge_packed(self, raws: list[bytes]) -> bytes:
        """Merge a list of packed states (compatibility-checked)."""
        acc = None
        for raw in raws:
            st = self.unpack(bytes(raw))
            acc = st if acc is None else self.merge(acc, st)
        if acc is None:
            acc = self.empty()
        return self.pack(acc)
