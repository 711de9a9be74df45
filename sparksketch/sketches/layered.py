"""Layered Bloom filter (commons-collections4 LayeredBloomFilter contract;
SURVEY.md Table B4) re-expressed for distributed time-windowed dedup.

The reference's layer manager advances layers by fill/time policy and evicts
old layers.  Distributed-native reformulation: a layer per *time bucket key*
(e.g. ``floor(ts / window)``), so the layer structure is a pure function of
the data, not of insertion order.  Merge = union-by-key with per-layer
bitwise OR — associative + commutative => byte-identical distributed merges.
Eviction = dropping keys below a watermark.  ``contains`` = any layer
(commons: contains if any layer contains); ``find`` returns matching layer
keys."""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import edh_indices
from ..shape import Shape
from .base import KIND_LAYERED, Sketch, pack_header, register
from .bloom import BloomFilter

_HDR = struct.Struct("<QII")  # m, k, n_layers
_LAYER_HDR = struct.Struct("<q")  # layer key


class LayeredBloomFilter(Sketch):
    KIND = KIND_LAYERED

    def __init__(self, shape: Shape,
                 layers: dict[int, np.ndarray] | None = None,
                 max_layers: int = 0) -> None:
        self.shape = shape
        self.layers = layers if layers is not None else {}
        self.max_layers = max_layers  # 0 = unbounded

    def _layer(self, key: int) -> np.ndarray:
        w = self.layers.get(key)
        if w is None:
            w = np.zeros(self.shape.num_words, dtype=np.uint64)
            self.layers[key] = w
        return w

    def add_hashes(self, keys: np.ndarray, h1: np.ndarray, h2: np.ndarray | None = None) -> None:
        """Batch insert: row i goes to layer ``keys[i]``."""
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return
        idx = edh_indices(h1, h2, self.shape.k, self.shape.m)
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        boundaries = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
        for b, e in zip(boundaries, np.r_[boundaries[1:], sk.size]):
            layer_idx = idx[order[b:e]].ravel()
            w = self._layer(int(sk[b]))
            word = (layer_idx >> 6).astype(np.int64)
            bit = np.left_shift(np.uint64(1), (layer_idx & 63).astype(np.uint64))
            np.bitwise_or.at(w, word, bit)
        self._evict()

    def _evict(self) -> None:
        if self.max_layers and len(self.layers) > self.max_layers:
            for key in sorted(self.layers)[: len(self.layers) - self.max_layers]:
                del self.layers[key]

    def merge(self, other: Sketch) -> None:
        if not isinstance(other, LayeredBloomFilter) or other.shape != self.shape:
            raise ValueError("shape mismatch in layered merge")
        for key, w in other.layers.items():
            mine = self.layers.get(key)
            if mine is None:
                self.layers[key] = w.copy()
            else:
                np.bitwise_or(mine, w, out=mine)
        self.max_layers = max(self.max_layers, other.max_layers)
        self._evict()

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        """True where ANY layer contains the item."""
        n = len(h1)
        if n == 0:
            return np.zeros(0, dtype=bool)
        idx = edh_indices(h1, h2, self.shape.k, self.shape.m)
        word = (idx >> 6).astype(np.int64)
        bit = np.left_shift(np.uint64(1), (idx & 63).astype(np.uint64))
        out = np.zeros(n, dtype=bool)
        for w in self.layers.values():
            out |= ((w[word] & bit) != 0).all(axis=1)
        return out

    def find_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> list[list[int]]:
        """Per row, the sorted list of layer keys containing the item
        (commons `find`)."""
        n = len(h1)
        if n == 0:
            return []
        idx = edh_indices(h1, h2, self.shape.k, self.shape.m)
        word = (idx >> 6).astype(np.int64)
        bit = np.left_shift(np.uint64(1), (idx & 63).astype(np.uint64))
        hits: list[list[int]] = [[] for _ in range(n)]
        for key in sorted(self.layers):
            w = self.layers[key]
            mask = ((w[word] & bit) != 0).all(axis=1)
            for r in np.flatnonzero(mask):
                hits[int(r)].append(key)
        return hits

    def evict_below(self, watermark_key: int) -> None:
        """Time-based eviction: drop layers strictly below the watermark."""
        for key in [k for k in self.layers if k < watermark_key]:
            del self.layers[key]

    def flatten(self) -> BloomFilter:
        bf = BloomFilter(self.shape)
        for w in self.layers.values():
            np.bitwise_or(bf.words, w, out=bf.words)
        return bf

    def cardinality(self) -> int:
        return self.flatten().cardinality()

    def to_bytes(self) -> bytes:
        parts = [pack_header(self.KIND),
                 _HDR.pack(self.shape.m, self.shape.k, len(self.layers))]
        for key in sorted(self.layers):  # canonical order
            parts.append(_LAYER_HDR.pack(key))
            parts.append(self.layers[key].astype("<u8", copy=False).tobytes())
        return b"".join(parts)

    @staticmethod
    def _decode(body: memoryview) -> "LayeredBloomFilter":
        m, k, n_layers = _HDR.unpack_from(body, 0)
        shape = Shape(m=int(m), k=int(k))
        off = _HDR.size
        layers: dict[int, np.ndarray] = {}
        wbytes = shape.num_words * 8
        for _ in range(n_layers):
            (key,) = _LAYER_HDR.unpack_from(body, off)
            off += _LAYER_HDR.size
            layers[int(key)] = np.frombuffer(
                body[off:off + wbytes], dtype="<u8").copy()
            off += wbytes
        return LayeredBloomFilter(shape, layers)


class FillLayeredBloomFilter:
    """Fill-policy layered Bloom filter — the commons-collections4
    LayerManager contract the time-bucketed :class:`LayeredBloomFilter`
    does not cover: the active layer ADVANCES when its cardinality-based
    ``estimate_n`` crosses ``target_n`` (cf. commons ``LayerManager`` /
    ``ADVANCE_ON_SATURATION``; dependency surface at reference
    pom.xml:17-28), and eviction keeps at most ``max_layers`` newest
    layers.  This is the piece a windowed-dedup user hits under BURSTY
    traffic: layers roll with load, not wall-clock.

    Order-dependent by definition (like the stable filter), so the
    distributed semantics are a deterministic ordered replay per
    partition (agg.fill_layered_build); cross-partition use goes through
    :meth:`as_layered` into the associative keyed-layer domain.

    The insert path is VECTORIZED despite the sequential predicate: for a
    batch, the first-occurrence row of every newly-set bit gives the
    cumulative cardinality as a step function of row index, so the advance
    row (first row where the pre-insert estimate crosses ``target_n``) is
    found with a ``searchsorted`` — one pass per layer advanced, never a
    per-item Python loop.  Re-inserted duplicates set no new bits and so
    never advance the layer (saturation, not traffic, rolls it)."""

    def __init__(self, shape: Shape, target_n: int,
                 max_layers: int = 0) -> None:
        if target_n < 1:
            raise ValueError("target_n must be >= 1")
        self.shape = shape
        self.target_n = target_n
        self.max_layers = max_layers
        self.layers: dict[int, np.ndarray] = {0: np.zeros(shape.num_words,
                                                          dtype=np.uint64)}
        self._active = 0
        # smallest cardinality whose estimate_n reaches target_n
        m, k = shape.m, shape.k
        c = int(np.ceil(m * (1.0 - np.exp(-target_n * k / m))))
        while c > 0 and shape.estimate_n(c - 1) >= target_n:
            c -= 1
        while c < m and shape.estimate_n(c) < target_n:
            c += 1
        self._card_bar = max(c, 1)
        # rescan window ~ a few fills of one layer: a chunk far larger
        # than the fill target degenerates to O(advances x chunk) rescans
        # (a 2048-row chunk at target 32 rescans ~64 times), while a tiny
        # chunk pays per-call numpy overhead per few rows
        self._chunk = int(min(max(4 * target_n, 64), self._CHUNK))

    @property
    def n_layers(self) -> int:
        return len(self.layers)

    def _advance(self) -> None:
        self._active += 1
        self.layers[self._active] = np.zeros(self.shape.num_words,
                                             dtype=np.uint64)
        if self.max_layers and len(self.layers) > self.max_layers:
            for key in sorted(self.layers)[:len(self.layers)
                                           - self.max_layers]:
                del self.layers[key]

    _CHUNK = 2048  # bound each advance's rescan window

    def insert_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> None:
        """Ordered replay of a batch: items are inserted in array order;
        the advance predicate is evaluated BEFORE each item (commons
        extendCheck-then-merge), vectorized per layer segment.

        Large batches are processed in fixed chunks: each layer advance
        rescans only the remaining rows of its chunk, so total work is
        O(n * k) instead of O(advances * n * k) when many layers roll in
        one batch.  Chunking cannot change results — the replay state
        carries across calls (asserted by the batch-split-invariance
        test)."""
        from ..bitops import popcount
        n = len(h1)
        if n == 0:
            return
        if n > self._chunk:
            for s in range(0, n, self._chunk):
                self.insert_hashes(
                    h1[s:s + self._chunk],
                    None if h2 is None else h2[s:s + self._chunk])
            return
        idx = edh_indices(h1, h2, self.shape.k, self.shape.m)
        start = 0
        while start < n:
            w = self.layers[self._active]
            base = popcount(w)
            seg = idx[start:]
            rows = np.repeat(np.arange(seg.shape[0], dtype=np.int64),
                             seg.shape[1])
            bits = seg.ravel()
            # drop bits already set in the active layer
            already = (w[(bits >> 6).astype(np.int64)]
                       & np.left_shift(np.uint64(1),
                                       (bits & 63).astype(np.uint64))) != 0
            bits_new, rows_new = bits[~already], rows[~already]
            if bits_new.size:
                order = np.lexsort((rows_new, bits_new))
                bs, rs = bits_new[order], rows_new[order]
                first = np.r_[True, bs[1:] != bs[:-1]]
                first_rows = np.sort(rs[first])
            else:
                first_rows = np.zeros(0, dtype=np.int64)
            # pre-insert cardinality before row r = base + #(first_rows < r);
            # advance before the first r where it reaches the bar
            need = self._card_bar - base
            if need <= 0:
                adv_at = 0
            elif first_rows.size >= need:
                # card reaches the bar once row first_rows[need-1] has been
                # inserted => the NEXT row sees the predicate true
                adv_at = int(first_rows[need - 1]) + 1
                if adv_at >= seg.shape[0]:
                    adv_at = -1  # bar reached only by the segment's end
            else:
                adv_at = -1
            take = seg.shape[0] if adv_at == -1 else adv_at
            if take > 0:
                tb = seg[:take].ravel()
                word = (tb >> 6).astype(np.int64)
                bit = np.left_shift(np.uint64(1), (tb & 63).astype(np.uint64))
                np.bitwise_or.at(w, word, bit)
            start += take
            if start < n:
                self._advance()

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> np.ndarray:
        return self.as_layered().contains_hashes(h1, h2)

    def find_hashes(self, h1: np.ndarray, h2: np.ndarray | None = None) -> list[list[int]]:
        return self.as_layered().find_hashes(h1, h2)

    def as_layered(self) -> LayeredBloomFilter:
        """Keyed-layer view (layer key = advance ordinal) — the bridge into
        the associative merge/serialize/probe domain."""
        return LayeredBloomFilter(self.shape,
                                  {k: v.copy() for k, v in self.layers.items()})


register(KIND_LAYERED, LayeredBloomFilter._decode)
