"""Property-based tests (hypothesis): shape math invariants, codec
round-trips, and merge algebra over arbitrary inputs — no Spark session."""

import numpy as np
from hypothesis import given, settings, strategies as st

MAX_EX = 200


@settings(max_examples=MAX_EX, deadline=None)
@given(n=st.integers(1, 10_000_000), p=st.floats(1e-12, 0.4))
def test_shape_from_np_invariants(n, p):
    from sparksketch.shape import Shape
    s = Shape.from_np(n, p)
    assert s.m >= 1 and s.k >= 1
    # the realized fp at n inserts stays within 2x of the requested p
    assert s.fp(n) <= 2 * p
    # estimate_n inverts cardinality monotonically
    assert s.estimate_n(0) == 0.0
    if s.m > 2:
        assert s.estimate_n(s.m // 2) <= s.estimate_n(s.m - 1)


@settings(max_examples=MAX_EX, deadline=None)
@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=0, max_size=200),
       st.integers(0, 2**32))
def test_bloom_codec_roundtrip_and_merge_commutes(hs, seed):
    from sparksketch.shape import Shape
    from sparksketch.sketches import BloomFilter, sketch_from_bytes
    shape = Shape.from_np(500, 1e-4)
    rng = np.random.default_rng(seed)
    h = np.array(hs, dtype=np.int64)
    split = rng.integers(0, 2, size=h.size).astype(bool)
    a, b = BloomFilter(shape), BloomFilter(shape)
    h2 = np.array([int(x) ^ 0x9E37 for x in hs], dtype=np.int64)
    if h.size:
        a.add_hashes(h[split], h2[split])
        b.add_hashes(h[~split], h2[~split])
    ab = sketch_from_bytes(a.to_bytes())
    ab.merge(b)
    ba = sketch_from_bytes(b.to_bytes())
    ba.merge(a)
    # commutative and byte-identical; round-trip preserves bytes
    assert ab.to_bytes() == ba.to_bytes()
    whole = BloomFilter(shape)
    if h.size:
        whole.add_hashes(h, h2)
    assert whole.to_bytes() == ab.to_bytes()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=1, max_size=300),
       st.integers(2, 5))
def test_hll_partition_invariance(hs, parts):
    from sparksketch.sketches import HyperLogLog, sketch_from_bytes
    h = np.array(hs, dtype=np.int64)
    whole = HyperLogLog(p=10)
    whole.add_hashes(h)
    merged = HyperLogLog(p=10)
    for chunk in np.array_split(h, parts):
        part = HyperLogLog(p=10)
        part.add_hashes(chunk)
        merged.merge(sketch_from_bytes(part.to_bytes()))
    assert merged.to_bytes() == whole.to_bytes()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(-1e9, 1e9, allow_nan=False), min_size=0,
                max_size=400))
def test_kll_rank_error_bound(vals):
    from sparksketch.sketches import KLLSketch
    sk = KLLSketch(k=200)
    v = np.array(vals, dtype=np.float64)
    sk.add_values(v)
    if v.size == 0:
        return
    for q in (0.1, 0.5, 0.9):
        est = sk.quantile(q)
        # with duplicated values a point "rank of est" is ill-defined
        # (hypothesis: all-equal input); the correct acceptance is the
        # interval form: strictly-less mass can't exceed q+tol and
        # less-or-equal mass can't fall below q-tol
        tol = max(0.1, 2.0 / np.sqrt(v.size))
        assert float((v < est).mean()) <= q + tol
        assert float((v <= est).mean()) >= q - tol


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=500),
       st.integers(1, 64))
def test_bottomk_distinct_exact_below_k(hs, k_small):
    from sparksketch.sketches import BottomKSketch
    h = np.array(hs, dtype=np.int64)
    sk = BottomKSketch(k=1 << 12)
    sk.add_hashes(h)
    # below capacity the estimate is EXACT distinct-by-hash
    import numpy as _np
    distinct = len(set(_np.asarray(h).view(_np.uint64).tolist())) if h.size else 0
    assert round(sk.distinct_estimate()) == distinct


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=64), st.integers(0, 2**32))
def test_hash_array64_deterministic_and_spread(data, seed):
    from sparksketch.hashing import hash_array64
    a = np.frombuffer(data, dtype=np.uint8)
    h1 = hash_array64(a, seed)
    h2 = hash_array64(a.copy(), seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64
    if data:
        flipped = bytearray(data)
        flipped[0] ^= 1
        assert hash_array64(np.frombuffer(bytes(flipped), dtype=np.uint8),
                            seed) != h1
