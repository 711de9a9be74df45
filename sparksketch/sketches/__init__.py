"""NumPy sketch kernels with a canonical binary codec.

Import order matters only for decoder registration; importing this package
registers every kind."""

from .base import (Sketch, merge_blob_list, merge_bytes,  # noqa: F401
                   sketch_from_bytes)
from .bloom import BloomFilter, SparseBloomFilter, pick_representation  # noqa: F401
from .bottomk import BottomKSketch  # noqa: F401
from .cms import CountMinSketch  # noqa: F401
from .counting import CountingBloomFilter  # noqa: F401
from .hll import HyperLogLog  # noqa: F401
from .kll import KLLSketch  # noqa: F401
from .layered import FillLayeredBloomFilter, LayeredBloomFilter  # noqa: F401
from .minhash import MinHashSketch  # noqa: F401
from .stable import StableBloomFilter  # noqa: F401
from .tdigest import TDigest  # noqa: F401
from . import setops  # noqa: F401
