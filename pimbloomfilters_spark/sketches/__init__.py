"""Pure-numpy mergeable sketch cores (Spark-free, picklable, byte-serializable).

Every sketch obeys the same lifecycle as the reference filter API
(``src/bloom_filter.hpp:44-74``): build (insert/insert_bulk), query
(contains/contains_bulk/estimate), aggregate (get_weight), serialize
(get_data/to_bytes) and restore (set_data/from_bytes) — plus ``merge``, the
associative/commutative combine that replaces the reference's physical
sharding across DPU ranks/tasklets (``src/pim_bloom_filter.cpp:77``).
"""

from .base import Sketch, sketch_from_bytes
from .bloom import BlockedBloomFilter
from .hll import HyperLogLog
from .cms import CountMinSketch
from .countsketch import CountSketch
from .countingbloom import CountingBloomFilter
from .kll import KLLSketch
from .mg import MisraGries
from .tdigest import TDigest
from .theta import ThetaSketch
from .factory import make_sketch, SKETCH_KINDS

__all__ = [
    "Sketch",
    "sketch_from_bytes",
    "CountSketch",
    "CountingBloomFilter",
    "BlockedBloomFilter",
    "HyperLogLog",
    "CountMinSketch",
    "KLLSketch",
    "TDigest",
    "MisraGries",
    "ThetaSketch",
    "make_sketch",
    "SKETCH_KINDS",
]
