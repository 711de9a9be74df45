"""Count-Min sketch (Cormode & Muthukrishnan 2005).

``d`` rows x ``w`` columns of int64 counters; row i probes column
``unsigned_mod(h1 + i*h2 + (i^3-i)/6, w)`` (same Kirsch–Mitzenmacher EDH
family as the Bloom probes, so only two JVM-side xxhash64 per item).  Point
query = min over rows; err <= eps*N with prob >= 1-delta for
``w = ceil(e/eps)``, ``d = ceil(ln(1/delta))``.  Merge = elementwise sum —
order/partition invariant => byte-identical distributed merges.

Also supports conservative ``inner_product`` and heavy-hitter estimation."""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import edh_indices
from .base import KIND_CMS, Sketch, pack_header, register

_HDR = struct.Struct("<QI")


class CountMinSketch(Sketch):
    KIND = KIND_CMS

    def __init__(self, w: int, d: int, table: np.ndarray | None = None) -> None:
        if w < 1 or d < 1:
            raise ValueError("w and d must be >= 1")
        self.w = w
        self.d = d
        if table is None:
            table = np.zeros((d, w), dtype=np.int64)
        self.table = table

    @staticmethod
    def from_eps_delta(eps: float, delta: float) -> "CountMinSketch":
        return CountMinSketch(w=int(math.ceil(math.e / eps)),
                              d=int(math.ceil(math.log(1.0 / delta))))

    def _cols(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        return edh_indices(h1, h2, self.d, self.w)  # (n, d)

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None,
                   counts: np.ndarray | None = None) -> None:
        n = len(h1)
        if n == 0:
            return
        cols = self._cols(h1, h2)
        if counts is None:
            counts = np.ones(n, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        for i in range(self.d):
            np.add.at(self.table[i], cols[:, i], counts)

    def query_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        n = len(h1)
        if n == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(h1, h2)
        rows = np.arange(self.d).reshape(1, -1)
        return self.table[rows, cols].min(axis=1)

    def merge(self, other: Sketch) -> None:
        if not isinstance(other, CountMinSketch) or (other.w, other.d) != (self.w, self.d):
            raise ValueError("dimension mismatch in CMS merge")
        self.table += other.table

    def total(self) -> int:
        """N = total weight inserted (row sums are all equal)."""
        return int(self.table[0].sum())

    def inner_product(self, other: "CountMinSketch") -> int:
        """Min over rows of row-wise dot product — join-size estimate."""
        if (other.w, other.d) != (self.w, self.d):
            raise ValueError("dimension mismatch")
        return int(min(int(np.dot(self.table[i], other.table[i]))
                       for i in range(self.d)))

    def to_bytes(self) -> bytes:
        return (pack_header(self.KIND) + _HDR.pack(self.w, self.d)
                + self.table.astype("<i8", copy=False).tobytes())

    @staticmethod
    def _decode(body: memoryview) -> "CountMinSketch":
        w, d = _HDR.unpack_from(body, 0)
        table = np.frombuffer(body[_HDR.size:], dtype="<i8",
                              count=w * d).copy().reshape(d, w)
        return CountMinSketch(int(w), int(d), table)


register(KIND_CMS, CountMinSketch._decode)
