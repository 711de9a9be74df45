"""Shape / StableShape golden tests ported from the reference
(/root/reference/src/test/java/org/xenei/bloomfilter/stable/StableShapeTest.java)."""

import math

import pytest

from sparksketch.shape import Shape, StableShape


def test_from_np_golden_5_02():
    # StableShapeTest.java:75,80,87-88
    s = Shape.from_np(5, 1 / 5)
    assert s.m == 17
    assert s.k == 2


def test_from_np_golden_17_001():
    # StableBloomFilterTest.java:46 (javadoc is stale; code yields m=163, k=7)
    s = Shape.from_np(17, 0.01)
    assert s.m == 163
    assert s.k == 7


def test_stable_defaults_from_np_5_02():
    base = Shape.from_np(5, 1 / 5)
    ss = StableShape.builder(base).build()
    # StableShapeTest.java:15-19,63-71,93-95
    assert ss.m == 17
    assert ss.k == 2
    assert ss.p == 6  # decrement count
    assert ss.max == 2  # reset value default
    assert ss.fps == 0.25  # 2^-k
    assert ss.expected_cardinality == 9
    assert abs(ss.stable_point - 0.526) < 1e-3
    assert ss.bits_per_cell == 2
    assert ss.cells_per_byte == 4


@pytest.mark.parametrize("mx,bits,cpb", [
    (1, 1, 8), (2, 2, 4), (3, 2, 4), (4, 3, 2), (7, 3, 2),
    (8, 4, 2), (15, 4, 2), (16, 5, 1), (31, 5, 1), (32, 6, 1),
    (64, 7, 1), (128, 8, 1), (255, 8, 1),
])
def test_bits_per_cell_ladder(mx, bits, cpb):
    # StableShapeTest.java:36-60 ladder
    base = Shape.from_np(5, 1 / 5)
    ss = StableShape.builder(base).set_max(mx).build()
    assert ss.bits_per_cell == bits
    assert ss.cells_per_byte == cpb


def test_set_d_sets_max():
    base = Shape.from_np(5, 1 / 5)
    ss = StableShape.builder(base).set_d(3).build()
    assert ss.max == 7
    with pytest.raises(ValueError):
        StableShape.builder(base).set_d(9)
    with pytest.raises(ValueError):
        StableShape.builder(base).set_d(0)


def test_builder_validation():
    with pytest.raises(ValueError):
        StableShape.builder(Shape(m=17, k=2)).set_max(0).build()
    with pytest.raises(ValueError):
        StableShape.builder(Shape(m=17, k=2)).set_max(256).build()
    with pytest.raises(ValueError):
        Shape(m=1, k=2)


def test_fps_from_k_and_k_from_fps():
    base = Shape(m=1000, k=0) if False else None
    ss = StableShape.builder().set_m(1000).set_fps(1 / 1024).build()
    assert ss.k == 10  # ceil(log2(1024))
    ss2 = StableShape.builder().set_m(1000).set_k(3).build()
    assert ss2.fps == 0.125


def test_estimate_n():
    s = Shape.from_np(17, 0.01)
    assert s.estimate_n(0) == 0.0
    assert math.isinf(s.estimate_n(s.m))
    # estimateN(k) after one item merged is ~1 (StableBloomFilterTest2.java:119-135)
    assert round(s.estimate_n(s.k)) == 1


def test_fp_bound_monotone():
    s = Shape.from_np(1000, 0.01)
    assert s.fp(1000) == pytest.approx(0.01, rel=0.2)
    assert s.fp(100) < s.fp(1000) < s.fp(5000)
