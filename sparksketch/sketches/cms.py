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
# body layout tag after (w, d): dense table vs (index, count) pairs
_LAYOUT_DENSE = b"\x00"
_LAYOUT_SPARSE = b"\x01"


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
        """Canonical encode with density-based layout auto-selection.

        A CMS partial over a low-cardinality key is almost entirely zeros
        (e.g. the bench's 2^14 x 4 table over ~13 distinct tools: 52
        nonzero cells of 65536), and partial blobs are exactly what a
        distributed build ships to the driver / across tree-merge rounds —
        at 64 partitions the dense layout is 32 MB of zeros on the wire.
        Sparse = (flat row-major cell index u64, count i64) pairs, indices
        ascending; chosen iff that is at most half the dense size.  The
        layout is a pure function of the table CONTENT, so equal merge
        states still serialize byte-identically regardless of merge order
        or partitioning (the canonical-codec contract, base.py)."""
        nnz = np.flatnonzero(self.table.reshape(-1))
        head = pack_header(self.KIND) + _HDR.pack(self.w, self.d)
        if nnz.size * 16 * 2 <= self.w * self.d * 8:
            counts = self.table.reshape(-1)[nnz]
            return (head + _LAYOUT_SPARSE
                    + struct.pack("<Q", nnz.size)
                    + nnz.astype("<u8", copy=False).tobytes()
                    + counts.astype("<i8", copy=False).tobytes())
        return (head + _LAYOUT_DENSE
                + self.table.astype("<i8", copy=False).tobytes())

    @staticmethod
    def _decode(body: memoryview) -> "CountMinSketch":
        w, d = _HDR.unpack_from(body, 0)
        rest = body[_HDR.size:]
        if len(rest) == w * d * 8:
            raise ValueError(
                "CMS blob predates the layout byte (round-5 wire change "
                "within version 2); re-build the sketch from source data")
        layout, rest = rest[0], rest[1:]
        if layout == _LAYOUT_DENSE[0]:
            table = np.frombuffer(rest, dtype="<i8",
                                  count=w * d).copy().reshape(d, w)
            return CountMinSketch(int(w), int(d), table)
        if layout != _LAYOUT_SPARSE[0]:
            raise ValueError(f"unknown CMS layout {layout}")
        (nnz,) = struct.unpack_from("<Q", rest, 0)
        idx = np.frombuffer(rest, dtype="<u8", count=nnz, offset=8)
        counts = np.frombuffer(rest, dtype="<i8", count=nnz,
                               offset=8 + 8 * nnz)
        table = np.zeros(w * d, dtype=np.int64)
        table[idx] = counts
        return CountMinSketch(int(w), int(d), table.reshape(d, w))


register(KIND_CMS, CountMinSketch._decode)
