"""Shape math for Bloom-family sketches.

Pure Python, zero Spark dependency; frozen dataclasses are built on the
driver and shipped to executors by closure capture.

Semantics follow the public commons-collections4 ``Shape`` contract that the
reference library builds on (reference: /root/reference/pom.xml:24-28) and the
stable-shape derivations in
/root/reference/src/main/java/org/xenei/bloomfilter/stable/StableShape.java
(builder math at :201-228, constructor at :53-70).  Formulas only — no code is
translated from the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

_LN2 = math.log(2.0)
_LN2_SQ = _LN2 * _LN2


@dataclass(frozen=True)
class Shape:
    """A Bloom filter shape: ``m`` bits probed by ``k`` hash functions."""

    m: int  # number of bits (cells)
    k: int  # number of hash functions

    def __post_init__(self) -> None:
        if self.m <= 1:
            raise ValueError("M must be greater than 1")
        if self.k < 1:
            raise ValueError("K must be at least 1")

    # -- constructors (Shape.fromNP / fromKM / fromPMK) ---------------------
    @staticmethod
    def from_np(n: int, p: float) -> "Shape":
        """Derive (m, k) from expected item count ``n`` and target fp rate ``p``.

        m = ceil(-n ln p / (ln 2)^2),  k = max(1, round(m/n * ln 2)).
        Golden: from_np(5, 1/5) -> m=17, k=2  (StableShapeTest.java:75,80).
        """
        if not (0.0 < p < 1.0):
            raise ValueError("p must be in (0, 1)")
        if n < 1:
            raise ValueError("n must be >= 1")
        m = math.ceil(-n * math.log(p) / _LN2_SQ)
        k = max(1, round((m / n) * _LN2))
        return Shape(m=m, k=k)

    @staticmethod
    def from_km(k: int, m: int) -> "Shape":
        return Shape(m=m, k=k)

    @staticmethod
    def from_pmk(p: float, m: int, k: int) -> "Shape":
        # p is advisory in the contract; validation only.
        if not (0.0 < p < 1.0):
            raise ValueError("p must be in (0, 1)")
        return Shape(m=m, k=k)

    # -- estimates ----------------------------------------------------------
    def estimate_n(self, cardinality: int) -> float:
        """``-(m/k) * ln(1 - c/m)``; +inf when the filter is full (c == m)."""
        if cardinality < 0 or cardinality > self.m:
            raise ValueError(f"cardinality must be in [0, {self.m}]")
        if cardinality == self.m:
            return math.inf
        return -(self.m / self.k) * math.log1p(-cardinality / self.m)

    def fp(self, n: int) -> float:
        """False-positive probability after ``n`` insertions:
        ``(1 - (1 - 1/m)^(k n))^k``."""
        return (1.0 - (1.0 - 1.0 / self.m) ** (self.k * n)) ** self.k

    @property
    def num_words(self) -> int:
        """Number of 64-bit words in the dense bitmap representation."""
        return (self.m + 63) // 64


@dataclass(frozen=True)
class StableShape:
    """Shape for the Stable Bloom Filter (Deng & Rafiei, SIGMOD 2006).

    Derivations mirror StableShape.java:53-70,201-228:
      - k from fps: ``k = ceil(log2(1/fps))``; fps from k: ``2^-k``
      - decrement count p from the SIGMOD'06 closed form with a k~m fallback
      - stablePoint = (1 / (1 + 1/(p(1/k - 1/m))))^max
      - expectedCardinality = ceil((1 - stablePoint) * m)
      - bitsPerCell = smallest b in [1,8] with max >> b == 0
    """

    m: int
    k: int
    fps: float
    p: int  # cells decremented per insert
    max: int  # reset value ("Max")
    bits_per_cell: int = field(init=False)
    stable_point: float = field(init=False)
    expected_cardinality: int = field(init=False)

    def __post_init__(self) -> None:
        if self.max < 1 or self.max > 255:
            raise ValueError("Max must be in the range [1,255]")
        bits = 8
        for i in range(1, 8):
            if (self.max >> i) == 0:
                bits = i
                break
        sp = (1.0 / (1.0 + 1.0 / (self.p * ((1.0 / self.k) - (1.0 / self.m))))) ** self.max
        object.__setattr__(self, "bits_per_cell", bits)
        object.__setattr__(self, "stable_point", sp)
        object.__setattr__(self, "expected_cardinality", int(math.ceil((1.0 - sp) * self.m)))
        if 2 ** self.bits_per_cell < self.max:
            raise ValueError(f"2^{self.bits_per_cell} < {self.max}")

    @property
    def shape(self) -> Shape:
        return Shape(m=self.m, k=self.k)

    @property
    def decrement_shape(self) -> Shape:
        return Shape(m=self.m, k=self.p)

    @property
    def cells_per_byte(self) -> int:
        return 8 // self.bits_per_cell

    @staticmethod
    def builder(shape: Shape | None = None) -> "StableShapeBuilder":
        b = StableShapeBuilder()
        if shape is not None:
            b.set_k(shape.k).set_m(shape.m)
        return b


class StableShapeBuilder:
    """Builder replicating StableShape.Builder semantics
    (StableShape.java:117-238)."""

    def __init__(self) -> None:
        self._fps = 0.0
        self._k = 0
        self._m = 0
        self._p = 0
        self._max = 2

    def set_fps(self, fps: float) -> "StableShapeBuilder":
        self._fps = fps
        return self

    def set_k(self, k: int) -> "StableShapeBuilder":
        self._k = k
        return self

    def set_m(self, m: int) -> "StableShapeBuilder":
        self._m = m
        return self

    def set_p(self, p: int) -> "StableShapeBuilder":
        self._p = p
        return self

    def set_max(self, mx: int) -> "StableShapeBuilder":
        self._max = mx
        return self

    def set_d(self, d: int) -> "StableShapeBuilder":
        if d > 8 or d < 1:
            raise ValueError("D must be in the range [1,8]")
        self._max = (1 << d) - 1
        return self

    def build(self) -> StableShape:
        if self._m <= 1:
            raise ValueError("M must be greater than 1")
        if self._k <= 0 and self._fps <= 0.0:
            raise ValueError("Either K or Fps must be greater than 0")
        if self._max <= 0 or self._max > 0xFF:
            raise ValueError("Max must be in the range [1,255]")
        k, fps, p, m, mx = self._k, self._fps, self._p, self._m, self._max
        if k <= 0:
            k = int(math.ceil(math.log(1.0 / fps) / _LN2))
        if fps <= 0.0:
            fps = 1.0 / (2.0 ** k)
        if p <= 0:
            one_over_k = 1.0 / k
            left_denom = 1.0 / ((1.0 - fps ** one_over_k) ** (1.0 / mx)) - 1.0
            right_denom = one_over_k - 1.0 / m
            p = int(math.ceil(1.0 / (left_denom * right_denom)))
            if p > m:
                # adjustment for cases where K is "close to" M
                p = int(math.ceil(1.0 / (left_denom * one_over_k)))
        return StableShape(m=m, k=k, fps=fps, p=p, max=mx)
