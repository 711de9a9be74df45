"""Packed-cell codec byte goldens, ported from the reference buffer tests
(/root/reference/src/test/java/org/xenei/bloomfilter/stable/
PackedBufferManagerTest.java and SimpleBufferManagerTest.java)."""

import numpy as np

from sparksketch.sketches.stable import pack_cells, unpack_cells


def test_packed_golden_3bit():
    """PackedBufferManagerTest.java:174-182 — 3-bit cells (max=4):
    set(0),set(1),set(2) => bytes {0x24, 0x04}."""
    cells = np.zeros(5, dtype=np.uint8)
    cells[0] = 4
    cells[1] = 4
    cells[2] = 4
    packed = pack_cells(cells, 3)
    assert packed[0] == 0x24
    assert packed[1] == 0x04


def test_packed_roundtrip_all_widths():
    rng = np.random.default_rng(42)
    for bits in (1, 2, 3, 4, 5, 8):
        mx = (1 << bits) - 1
        for m in (1, 7, 8, 17, 163):
            cells = rng.integers(0, mx + 1, size=m).astype(np.uint8)
            packed = pack_cells(cells, bits)
            got = unpack_cells(packed, m, bits)
            assert (got == cells).all(), (bits, m)


def test_simple_layout_one_byte_per_cell():
    """SimpleBufferManagerTest.java:16-84 — max=128 => 8 bits/cell, 17 cells,
    one byte each; set(1),set(3) => 128 at offsets 1 and 3."""
    cells = np.zeros(17, dtype=np.uint8)
    cells[1] = 128
    cells[3] = 128
    packed = pack_cells(cells, 8)
    assert len(packed) == 17
    assert packed[1] == 128 and packed[3] == 128 and packed[0] == 0


def test_packed_2bit_four_cells_per_byte():
    # bits=2 (max=3): cells per byte = 4; cell e -> byte e//4, shift (e%4)*2
    cells = np.array([3, 0, 0, 0, 2, 1, 0, 0, 3], dtype=np.uint8)
    packed = pack_cells(cells, 2)
    assert packed[0] == 0b00000011
    assert packed[1] == (2 << 0) | (1 << 2)
    assert packed[2] == 3
