"""Blocked Bloom invariants — the reference's own test grid re-expressed
(tests/unit_test1.cpp:25-116, unit_test2.cpp:26-145): size2 x nb_hash x
partition-count sections; weight/no-FN/FPR/order/serialize invariants."""

import numpy as np
import pytest

from pimbloomfilters_spark.sketches import BlockedBloomFilter, sketch_from_bytes

NB_ITEMS = 10_000  # mirrors NB_ITEMS at tests/unit_test1.cpp:15
NB_NEG = 1_000     # mirrors NB_NO_ITEMS at tests/unit_test1.cpp:16

GRID = [(size2, k) for size2 in (16, 24) for k in (1, 4, 8)]


def _items(n=NB_ITEMS):
    return np.arange(n, dtype=np.int64)  # sequential keys, tests/tests_utils.hpp:13-20


def _negatives(n=NB_NEG):
    return np.arange(NB_ITEMS, NB_ITEMS + n, dtype=np.int64)


@pytest.mark.parametrize("size2,k", GRID)
def test_reference_invariant_grid(size2, k):
    bf = BlockedBloomFilter(size2=size2, nb_hash=k)
    # fresh filter: weight 0 (unit_test1.cpp:59-61)
    assert bf.get_weight() == 0
    # one insert: 0 < weight <= k (unit_test1.cpp:63-68)
    bf.insert(7)
    w1 = bf.get_weight()
    assert 0 < w1 <= k
    assert bf.contains(7)
    # idempotent re-insert (unit_test1.cpp:73-76)
    bf.insert(7)
    assert bf.get_weight() == w1
    # bulk no-false-negatives on shuffled probes (unit_test1.cpp:78-85)
    items = _items()
    bf.insert_bulk(items)
    rng = np.random.default_rng(42)
    shuffled = rng.permutation(items)
    assert bf.contains_bulk(shuffled).all()
    # FPR sanity (unit_test1.cpp:87-96): warn threshold 0.5 in the reference;
    # we assert against the blocked-Bloom theoretical bound with slack
    fpr = bf.contains_bulk(_negatives()).mean()
    bound = bf.theoretical_fpr_bound(NB_ITEMS)
    assert fpr <= min(1.0, 3 * bound + 0.02), (fpr, bound)


def test_probe_order_preserved():
    # unit_test1.cpp:98-106 — results align with input order, both directions
    bf = BlockedBloomFilter(size2=16, nb_hash=4)
    bf.insert(1)
    pos_neg = bf.contains_bulk(np.array([1, 100], dtype=np.int64))
    neg_pos = bf.contains_bulk(np.array([100, 1], dtype=np.int64))
    assert pos_neg.tolist() == [True, False]
    assert neg_pos.tolist() == [False, True]


def test_serialize_restore_roundtrip():
    # unit_test1.cpp:108-116 — get_data/set_data preserves weight + no-FN
    bf = BlockedBloomFilter(size2=20, nb_hash=8)
    bf.insert_bulk(_items())
    blob = bf.to_bytes()
    bf2 = sketch_from_bytes(blob)
    assert isinstance(bf2, BlockedBloomFilter)
    assert bf2.get_weight() == bf.get_weight()
    assert bf2.contains_bulk(_items()).all()
    # raw payload path (reference get_data/set_data)
    bf3 = BlockedBloomFilter(size2=20, nb_hash=8)
    bf3.set_data(bf.get_data())
    assert bf3.get_weight() == bf.get_weight()


def test_merge_assoc_comm():
    a = _items(5000)
    b = np.arange(5000, 10000, dtype=np.int64)
    c = np.arange(10000, 15000, dtype=np.int64)

    def build(vals):
        bf = BlockedBloomFilter(size2=20, nb_hash=4)
        bf.insert_bulk(vals)
        return bf

    ab_c = build(a).merge(build(b)).merge(build(c))
    c_ba = build(c).merge(build(b)).merge(build(a))
    one = build(np.concatenate([a, b, c]))
    assert ab_c.payload() == c_ba.payload() == one.payload()


def test_geometry_validation():
    with pytest.raises(ValueError):
        BlockedBloomFilter(size2=2, nb_hash=1)   # size2 >= 3 (hpp:31-36)
    with pytest.raises(ValueError):
        BlockedBloomFilter(size2=16, nb_hash=0)  # nb_hash >= 1
    with pytest.raises(ValueError):
        BlockedBloomFilter(size2=16, nb_hash=10)  # nb_hash < 10 (hpp:272-274)


def test_blocked_locality():
    # all k bits of one item land inside a single 4096-bit block
    bf = BlockedBloomFilter(size2=24, nb_hash=8)
    pos = bf._positions(np.arange(1000, dtype=np.int64)).reshape(-1, 8)
    blocks = pos // bf.block_bits
    assert (blocks == blocks[:, :1]).all()


def test_fpr_within_blocked_bound_sweep():
    # FPR-vs-bound across the reference bench geometry (scaled down):
    # n/m ratio like m=2^32,n=100M -> ratio ~0.023 items/bit
    n = 200_000
    bf = BlockedBloomFilter(size2=23, nb_hash=8)  # 8.4M bits, ratio 0.024
    bf.insert_bulk(np.arange(n, dtype=np.int64))
    neg = np.arange(10_000_000, 10_100_000, dtype=np.int64)
    fpr = bf.contains_bulk(neg).mean()
    bound = bf.theoretical_fpr_bound(n)
    assert fpr <= 2.0 * bound + 1e-4, (fpr, bound)


@pytest.mark.parametrize("k", [1, 4, 8])
def test_fpr_grid_vs_bound(k):
    """BASELINE metric: measured FPR within the theoretical bound across the
    reference's geometry grid (scaled from its m=2^30..33, n=10M/100M runs to
    the same load ratios at test size)."""
    rng_negatives = np.arange(50_000_000, 50_200_000, dtype=np.int64)
    for size2, n in [(20, 20_000), (20, 100_000), (22, 100_000), (22, 400_000)]:
        bf = BlockedBloomFilter(size2=size2, nb_hash=k)
        bf.insert_bulk(np.arange(n, dtype=np.int64))
        measured = bf.contains_bulk(rng_negatives).mean()
        bound = bf.theoretical_fpr_bound(n)
        # allow binomial noise: 3 sigma on 200k probes plus 50% model slack
        sigma = (bound / len(rng_negatives)) ** 0.5
        assert measured <= 1.5 * bound + 3 * sigma + 2e-5, (size2, k, n, measured, bound)


@pytest.mark.parametrize("size2,k", GRID)
def test_unblocked_variant_grid(size2, k):
    """The reference's BASIC (non-blocked) variant semantics
    (src/bloom_filter_factory.cpp:19-47, src/standard_bloom_filter.cpp:14-29):
    k positions placed independently across the whole filter. Same invariant
    grid as the blocked tests: weight bounds, no false negatives, order,
    serialize round-trip, idempotent re-insert."""
    bf = BlockedBloomFilter(size2=size2, nb_hash=k, blocked=False)
    assert bf.n_blocks == 1 and bf.block_bits == bf.m_bits
    assert bf.get_weight() == 0
    items = _items()
    bf.insert_bulk(items)
    w = bf.get_weight()
    assert 0 < w <= k * NB_ITEMS
    assert bf.contains_bulk(items).all(), "false negative"
    again = BlockedBloomFilter(size2=size2, nb_hash=k, blocked=False)
    again.insert_bulk(items)
    again.insert_bulk(items)  # idempotent re-insert
    assert again.payload() == bf.payload()
    restored = sketch_from_bytes(bf.to_bytes())
    assert restored.payload() == bf.payload()
    assert restored.config()["blocked"] is False
    assert restored.contains_bulk(items).all()


def test_unblocked_fpr_near_ideal_bound():
    """Measured FPR of the unblocked variant tracks the ideal-Bloom formula
    (the whole point of BASIC: minimum FPR at fixed m). Geometry chosen so
    the ideal FPR is large enough to measure: m=2^18, n=20k, k=4 ->
    ideal ~4.7e-3."""
    n = 20_000
    bf = BlockedBloomFilter(size2=18, nb_hash=4, blocked=False)
    bf.insert_bulk(np.arange(n, dtype=np.int64))
    neg = np.arange(1_000_000, 1_500_000, dtype=np.int64)
    measured = bf.contains_bulk(neg).mean()
    bound = bf.theoretical_fpr_bound(n)
    assert 0.5 * bound <= measured <= 1.5 * bound, (measured, bound)


def test_unblocked_beats_blocked_at_low_fill():
    """At low fill the blocked construction pays its double-hash in-block
    floor; the unblocked variant's measured FPR must be materially lower at
    the same (m, k, n) — the reason a min-FPR user picks BASIC."""
    n, size2, k = 100_000, 26, 8
    items = np.arange(n, dtype=np.int64)
    neg = np.arange(5_000_000, 7_000_000, dtype=np.int64)
    blocked = BlockedBloomFilter(size2=size2, nb_hash=k)
    blocked.insert_bulk(items)
    basic = BlockedBloomFilter(size2=size2, nb_hash=k, blocked=False)
    basic.insert_bulk(items)
    fp_blocked = blocked.contains_bulk(neg).sum()
    fp_basic = basic.contains_bulk(neg).sum()
    assert fp_basic < fp_blocked, (fp_basic, fp_blocked)
    assert basic.theoretical_fpr_bound(n) < blocked.theoretical_fpr_bound(n)


def test_factory_variant_presets():
    """The reference factory's enum, semantically (bloom_filter_factory.cpp:
    7-13): BASIC = unblocked, CACHE = 2^6-bit blocks, PIM = 4096-bit blocks.
    All satisfy the no-FN contract; presets are overridable."""
    from pimbloomfilters_spark.sketches import make_sketch

    items = _items(5000)
    basic = make_sketch("bloom", variant="basic", size2=20, nb_hash=4)
    cache = make_sketch("bloom", variant="cache", size2=20, nb_hash=4)
    pim = make_sketch("bloom", variant="pim", size2=20, nb_hash=4)
    assert basic.n_blocks == 1
    assert cache.block_bits == 64
    assert pim.block_bits == 4096
    for bf in (basic, cache, pim):
        bf.insert_bulk(items)
        assert bf.contains_bulk(items).all()
    # cache pays the highest FPR (tiny blocks), basic the lowest
    neg = _negatives(100_000)
    assert basic.contains_bulk(neg).sum() <= pim.contains_bulk(neg).sum() \
        <= cache.contains_bulk(neg).sum()
    with pytest.raises(ValueError):
        make_sketch("hll", variant="basic")
    with pytest.raises(ValueError):
        make_sketch("bloom", variant="nope")


def test_counting_bloom_delete_semantics():
    """Counting Bloom: membership equals the bit Bloom at identical
    geometry; deletes never create false negatives for remaining keys;
    underflow (deleting a non-member) raises; merge/subtract are exact
    counter algebra; serialize round-trips."""
    import numpy as np
    import pytest as _pt

    from pimbloomfilters_spark.sketches import make_sketch, sketch_from_bytes

    keys = np.arange(10_000, dtype=np.int64)
    cb = make_sketch("countingbloom", size2=20, nb_hash=8)
    cb.insert_bulk(keys)
    bb = make_sketch("bloom", size2=20, nb_hash=8)
    bb.insert_bulk(keys)
    probe = np.arange(20_000, dtype=np.int64)
    assert np.array_equal(cb.contains_bulk(probe), bb.contains_bulk(probe))

    cb.delete_bulk(keys[:5000])
    assert cb.contains_bulk(keys[5000:]).all()  # no FN from deletion
    with _pt.raises(ValueError):
        cb.delete_bulk(np.array([10**9]))

    a = make_sketch("countingbloom", size2=20, nb_hash=8)
    b = make_sketch("countingbloom", size2=20, nb_hash=8)
    a.insert_bulk(keys[:5000]); b.insert_bulk(keys[5000:])
    merged = a.merge(b)
    full = make_sketch("countingbloom", size2=20, nb_hash=8)
    full.insert_bulk(keys)
    assert np.array_equal(merged._counters, full._counters)
    d = make_sketch("countingbloom", size2=20, nb_hash=8)
    d.insert_bulk(keys[:5000])
    full.subtract(d)
    assert np.array_equal(full._counters, cb._counters)
    with _pt.raises(ValueError):  # subtracting d again must underflow
        full.subtract(d)
    back = sketch_from_bytes(cb.to_bytes())
    assert np.array_equal(back._counters, cb._counters)
    assert back.n_items == cb.n_items


def test_counting_bloom_multi_chunk_delete_atomic():
    """A delete batch spanning multiple chunks that fails validation must
    leave the filter byte-identical (all-or-nothing across chunks)."""
    import numpy as np

    from pimbloomfilters_spark.sketches import CountingBloomFilter, make_sketch

    cb = make_sketch("countingbloom", size2=16, nb_hash=4)
    keys = np.arange(5000, dtype=np.int64)
    cb.insert_bulk(keys)
    CountingBloomFilter._CHUNK, saved = 1024, CountingBloomFilter._CHUNK
    try:
        before = cb._counters.copy()
        # valid keys in early chunks, a non-member in the LAST chunk
        bad = np.concatenate([keys[:4000], np.array([10**9])])
        import pytest as _pt

        with _pt.raises(ValueError):
            cb.delete_bulk(bad)
        assert np.array_equal(cb._counters, before), "partial delete applied"
        cb.delete_bulk(keys[:4000])  # the valid prefix alone still works
        assert cb.contains_bulk(keys[4000:]).all()
    finally:
        CountingBloomFilter._CHUNK = saved


def test_counting_bloom_insert_overflow_atomic():
    """A hot key repeated exactly 65536 times in ONE chunk wraps its k
    counters back to their prior value — a before/after probe cannot see
    it. insert_bulk must raise (headroom check) and leave the filter
    byte-identical; a smaller hot batch that fits must still apply."""
    import numpy as np
    import pytest as _pt

    from pimbloomfilters_spark.sketches import make_sketch

    cb = make_sketch("countingbloom", size2=8, nb_hash=2)
    base = np.arange(100, dtype=np.int64)
    cb.insert_bulk(base)
    before = cb._counters.copy()
    hot = np.full(1 << 16, 7, dtype=np.int64)  # 65536 copies, one chunk
    with _pt.raises(OverflowError):
        cb.insert_bulk(hot)
    assert np.array_equal(cb._counters, before), "partial insert applied"
    assert cb.contains_bulk(base).all()  # no silent false negative
    cb.insert_bulk(hot[: (1 << 16) - 200])  # fits: 65336 + prior < 65536
    assert cb.contains_bulk(base).all()
    assert cb.contains(7)


def test_counting_bloom_insert_overflow_cross_chunk():
    """Overflow assembled ACROSS chunk boundaries (each chunk individually
    fine) must also raise before any mutation."""
    import numpy as np
    import pytest as _pt

    from pimbloomfilters_spark.sketches import CountingBloomFilter, make_sketch

    cb = make_sketch("countingbloom", size2=8, nb_hash=2)
    CountingBloomFilter._CHUNK, saved = 1024, CountingBloomFilter._CHUNK
    try:
        cb.insert_bulk(np.full(60_000, 3, dtype=np.int64))
        before = cb._counters.copy()
        with _pt.raises(OverflowError):  # 60k + 10k > 65535 per cell
            cb.insert_bulk(np.full(10_000, 3, dtype=np.int64))
        assert np.array_equal(cb._counters, before)
    finally:
        CountingBloomFilter._CHUNK = saved
