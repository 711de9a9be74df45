"""Set operations over Bloom-family sketches — the commons-collections4
``SetOperations`` surface (SURVEY.md Table B13) plus the reference's
estimateUnion / estimateIntersection semantics
(StableBloomFilter.java:195-223 and the BloomFilter interface defaults).

All functions take any sketch exposing a dense bitmap (BloomFilter, or
anything with ``flatten()``) and operate on popcounts of ``&``, ``|``, ``^``.
"""

from __future__ import annotations

import math

import numpy as np

from ..bitops import popcount
from .bloom import BloomFilter

_I32MAX = 2 ** 31 - 1


def _words(f) -> np.ndarray:
    if isinstance(f, BloomFilter):
        return f.words
    if hasattr(f, "flatten"):
        return f.flatten().words
    if hasattr(f, "to_dense"):
        return f.to_dense().words
    raise TypeError(f"no dense bitmap for {type(f)}")


def _popcount(words: np.ndarray) -> int:
    return popcount(words)


def and_cardinality(a, b) -> int:
    return _popcount(_words(a) & _words(b))


def or_cardinality(a, b) -> int:
    return _popcount(_words(a) | _words(b))


def xor_cardinality(a, b) -> int:
    return _popcount(_words(a) ^ _words(b))


def hamming_distance(a, b) -> int:
    """SetOperations.hammingDistance: popcount(A xor B)."""
    return xor_cardinality(a, b)


def cosine_similarity(a, b) -> float:
    """SetOperations.cosineSimilarity: |A&B| / sqrt(|A|*|B|); 0 if either empty."""
    num = and_cardinality(a, b)
    ca = _popcount(_words(a))
    cb = _popcount(_words(b))
    if ca == 0 or cb == 0:
        return 0.0
    return num / math.sqrt(ca * cb)


def cosine_distance(a, b) -> float:
    return 1.0 - cosine_similarity(a, b)


def jaccard_similarity(a, b) -> float:
    """SetOperations.jaccardSimilarity: |A&B| / |A|B|; 0 if union empty."""
    union = or_cardinality(a, b)
    if union == 0:
        return 0.0
    return and_cardinality(a, b) / union


def jaccard_distance(a, b) -> float:
    return 1.0 - jaccard_similarity(a, b)


def estimate_union(a, b) -> int:
    """BloomFilter.estimateUnion default: round(estimateN(A | B));
    Integer.MAX_VALUE when infinite."""
    shape = a.shape if isinstance(a, BloomFilter) else a.shape
    e = shape.estimate_n(or_cardinality(a, b))
    if math.isinf(e):
        return _I32MAX
    return int(round(e))


def estimate_intersection(a, b) -> int:
    """Inclusion-exclusion with the reference's infinity/clamp handling
    (StableBloomFilter.java:195-223)."""
    shape_a = a.shape
    e_a = shape_a.estimate_n(
        a.cardinality() if hasattr(a, "cardinality") else _popcount(_words(a)))
    e_b = shape_a.estimate_n(
        b.cardinality() if hasattr(b, "cardinality") else _popcount(_words(b)))
    if math.isinf(e_a) and math.isinf(e_b):
        return _I32MAX
    if math.isinf(e_a):
        est = round(e_b)
    elif math.isinf(e_b):
        est = round(e_a)
    else:
        e_union = shape_a.estimate_n(or_cardinality(a, b))
        if math.isinf(e_union):
            raise ValueError(
                "The estimated N for the union of the filters is infinite")
        est = round(e_a + e_b - e_union)
        est = max(est, 0)
    return _I32MAX if est > _I32MAX else int(est)
