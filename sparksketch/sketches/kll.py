"""KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016).

Levels of float64 item buffers; level h items carry weight 2^h.  Level
capacities shrink geometrically (c = 2/3) from the top.  Compaction sorts a
level and keeps every other item (offset bit derived *deterministically* from
a hash of the level contents — no RNG), pushing survivors up one level.

Guarantees:
  - rank error <= eps with k = O((1/eps) * sqrt(log(1/delta)))
    (practically: eps ~ 2.2/k single-sketch normalized rank error)
  - EXACT regime: while total inserted <= k no compaction occurs, so
    quantiles are exact and match SQL ``quantile_cont`` interpolation —
    the oracle regime used by the driver correctness gate.
  - Determinism: run-to-run deterministic.  Byte-identicality across
    *different* merge trees is not information-theoretically possible for
    compacting quantile sketches; the distributed layer canonicalizes by
    merging partials in sorted partition order (see agg.py).  For a fully
    order-invariant mergeable quantile/sample sketch use bottomk.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import hash_array64
from .base import KIND_KLL, Sketch, pack_header, register

_HDR = struct.Struct("<IQddB")  # k, n, min, max, n_levels
_LVL = struct.Struct("<I")
_C = 2.0 / 3.0


class KLLSketch(Sketch):
    KIND = KIND_KLL

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 n: int = 0, min_v: float = np.inf, max_v: float = -np.inf) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels = levels if levels is not None else [np.zeros(0)]
        self.n = n
        self.min_v = min_v
        self.max_v = max_v

    # -- capacity & compaction ---------------------------------------------
    def _cap(self, h: int) -> int:
        depth_from_top = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C ** depth_from_top))))

    def _total(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _compact(self) -> None:
        while self._total() > self._total_cap():
            # compact the lowest level at/over capacity
            for h in range(len(self.levels)):
                if self.levels[h].size >= self._cap(h):
                    lv = np.sort(self.levels[h])
                    # deterministic offset bit from content hash
                    off = hash_array64(lv, seed=h) & 1
                    keep = lv[off::2]
                    self.levels[h] = np.zeros(0)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.zeros(0))
                    self.levels[h + 1] = np.concatenate([self.levels[h + 1], keep])
                    break
            else:
                break

    # -- updates ------------------------------------------------------------
    def add_values(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.n += int(values.size)
        self.min_v = min(self.min_v, float(values.min()))
        self.max_v = max(self.max_v, float(values.max()))
        self.levels[0] = np.concatenate([self.levels[0], values])
        self._compact()

    def merge(self, other: Sketch) -> None:
        if not isinstance(other, KLLSketch) or other.k != self.k:
            raise ValueError("k mismatch in KLL merge")
        if other.n == 0:
            return
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self.min_v = min(self.min_v, other.min_v)
        self.max_v = max(self.max_v, other.max_v)
        self._compact()

    # -- queries ------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, lv in enumerate(self.levels):
            if lv.size:
                vals.append(lv)
                wts.append(np.full(lv.size, 1 << h, dtype=np.float64))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        v, w = self._weighted_items()
        if len(self.levels) == 1:
            # exact regime: continuous interpolation == SQL quantile_cont
            pos = q * (v.size - 1)
            lo = int(np.floor(pos))
            hi = min(lo + 1, v.size - 1)
            frac = pos - lo
            # lerp form (lo + f*(hi-lo)), not the blend (1-f)*lo + f*hi:
            # the blend can round a tick away from the endpoints even when
            # both are EQUAL; DuckDB's quantile_cont uses the lerp form,
            # so this keeps the exact-regime oracle bit-aligned
            return float(v[lo] + frac * (v[hi] - v[lo]))
        cum = np.cumsum(w) - 0.5 * w
        target = q * w.sum()
        return float(np.interp(target, cum, v))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, value: float) -> float:
        """Approximate normalized rank of ``value`` (fraction <= value)."""
        if self.n == 0:
            return float("nan")
        v, w = self._weighted_items()
        return float(w[v <= value].sum() / w.sum())

    # -- codec --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        # canonical: levels stored sorted
        parts = [pack_header(self.KIND),
                 _HDR.pack(self.k, self.n, self.min_v, self.max_v,
                           len(self.levels))]
        for lv in self.levels:
            s = np.sort(lv)
            parts.append(_LVL.pack(s.size))
            parts.append(s.astype("<f8", copy=False).tobytes())
        return b"".join(parts)

    @staticmethod
    def _decode(body: memoryview) -> "KLLSketch":
        k, n, mn, mx, n_levels = _HDR.unpack_from(body, 0)
        off = _HDR.size
        levels = []
        for _ in range(n_levels):
            (cnt,) = _LVL.unpack_from(body, off)
            off += _LVL.size
            levels.append(np.frombuffer(body[off:off + 8 * cnt], dtype="<f8").copy())
            off += 8 * cnt
        return KLLSketch(int(k), levels, int(n), float(mn), float(mx))


register(KIND_KLL, KLLSketch._decode)
