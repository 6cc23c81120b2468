"""Property-based invariants (hypothesis): the reference's contracts must
hold for ARBITRARY int64 key sets, not just the sequential fixtures."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pimbloomfilters_spark.sketches import (
    BlockedBloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLLSketch,
    sketch_from_bytes,
)

keysets = st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                   min_size=1, max_size=500)


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=keysets, size2=st.sampled_from([10, 16, 20]),
       k=st.sampled_from([1, 4, 8]))
def test_bloom_never_false_negative(keys, size2, k):
    bf = BlockedBloomFilter(size2=size2, nb_hash=k)
    arr = np.array(keys, dtype=np.int64)
    bf.insert_bulk(arr)
    assert bf.contains_bulk(arr).all()


@settings(max_examples=30, deadline=None)
@given(keys=keysets)
def test_bloom_split_merge_equals_oneshot(keys):
    arr = np.array(keys, dtype=np.int64)
    cut = len(arr) // 2
    a = BlockedBloomFilter(size2=16, nb_hash=4)
    b = BlockedBloomFilter(size2=16, nb_hash=4)
    a.insert_bulk(arr[:cut])
    b.insert_bulk(arr[cut:])
    one = BlockedBloomFilter(size2=16, nb_hash=4)
    one.insert_bulk(arr)
    assert a.merge(b).payload() == one.payload()


@settings(max_examples=30, deadline=None)
@given(keys=keysets)
def test_roundtrip_all_kinds(keys):
    arr = np.array(keys, dtype=np.int64)
    for sk in (BlockedBloomFilter(size2=12, nb_hash=4), HyperLogLog(p=8),
               CountMinSketch(eps=1e-2, delta=1e-2), KLLSketch(k=32)):
        sk.insert_bulk(arr if sk.kind != "kll" else arr.astype(np.float64))
        back = sketch_from_bytes(sk.to_bytes())
        assert back.to_bytes() == sk.to_bytes()


@settings(max_examples=30, deadline=None)
@given(keys=keysets)
def test_cms_never_underestimates(keys):
    arr = np.array(keys, dtype=np.int64)
    c = CountMinSketch(eps=1e-2, delta=1e-2)
    c.insert_bulk(arr)
    uniq, counts = np.unique(arr, return_counts=True)
    assert (c.query_bulk(uniq) >= counts).all()


@settings(max_examples=30, deadline=None)
@given(keys=keysets)
def test_hll_insert_order_irrelevant(keys):
    arr = np.array(keys, dtype=np.int64)
    a, b = HyperLogLog(p=10), HyperLogLog(p=10)
    a.insert_bulk(arr)
    b.insert_bulk(arr[::-1].copy())
    assert a.payload() == b.payload()
