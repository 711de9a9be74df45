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

    def add_hashes(self, keys: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> None:
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

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
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

    def find_hashes(self, h1: np.ndarray, h2: np.ndarray) -> list[list[int]]:
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


register(KIND_LAYERED, LayeredBloomFilter._decode)
