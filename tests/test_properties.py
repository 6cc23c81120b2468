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


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=keysets)
def test_unblocked_bloom_never_false_negative(keys):
    bf = BlockedBloomFilter(size2=16, nb_hash=8, blocked=False)
    arr = np.array(keys, dtype=np.int64)
    bf.insert_bulk(arr)
    assert bf.contains_bulk(arr).all()
    assert sketch_from_bytes(bf.to_bytes()).contains_bulk(arr).all()


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=keysets, splits=st.integers(min_value=1, max_value=5))
def test_theta_split_merge_equals_oneshot(keys, splits):
    """Theta union-merge == single-stream build for ARBITRARY key sets and
    ARBITRARY partitionings — byte-identical (the KMV property)."""
    from pimbloomfilters_spark.sketches import ThetaSketch

    arr = np.array(keys, dtype=np.int64)
    single = ThetaSketch(k=64)
    single.insert_bulk(arr)
    merged = ThetaSketch(k=64)
    for part in np.array_split(arr, splits):
        p = ThetaSketch(k=64)
        p.insert_bulk(part)
        merged.merge(p)
    assert merged.payload() == single.payload()
    # exact mode correctness for small distinct sets
    n_distinct = len(set(keys))
    if n_distinct < 64:
        assert single.estimate() == float(n_distinct)


@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(px=st.lists(st.integers(min_value=0, max_value=255),
                   min_size=6, max_size=96))
def test_netpbm_roundtrip_property(px):
    """encode->decode is the identity for arbitrary pixel data in both P6
    (rgb) and P5 (gray) at arbitrary (h, w) factorizations."""
    from pimbloomfilters_spark.functions import multimodal

    n = len(px) - len(px) % 3
    if n >= 3:
        rgb = np.array(px[:n], dtype=np.uint8).reshape(-1, 1, 3)
        assert (multimodal.decode_netpbm(multimodal.encode_netpbm(rgb)) == rgb).all()
    gray = np.array(px, dtype=np.uint8).reshape(1, -1)
    out = multimodal.decode_netpbm(multimodal.encode_netpbm(gray))
    assert (out[:, :, 0] == gray).all()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts=st.lists(
    st.text(alphabet="ab é世", min_size=0, max_size=30),
    min_size=1, max_size=12))
def test_batch_distinct_grams_matches_reference(texts):
    """The flat-array gram extractor (boundary masking, Horner packing,
    lexsort dedup) must agree with a trivially-correct per-doc Python
    reference for arbitrary (including unicode and empty) texts."""
    from pimbloomfilters_spark.functions.dedup import _batch_distinct_grams

    n = 3
    packed, starts, doc_idx = _batch_distinct_grams(texts, n)
    # reference: per-doc set of base-256 packed byte windows (a bijection
    # gram <-> uint64 for n <= 8, which the minhash verify stage relies on)
    expect = {}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8", "ignore")
        s = set()
        for p in range(len(raw) - n + 1):
            v = 0
            for b in raw[p:p + n]:
                v = v * 256 + b
            s.add(v)
        if s:
            expect[i] = s
    got = {}
    bounds = list(starts) + [len(packed)]
    for j, d in enumerate(doc_idx):
        got[int(d)] = set(int(x) for x in packed[bounds[j]:bounds[j + 1]])
    assert got == expect


@settings(max_examples=40, deadline=None)
@given(cut=st.integers(min_value=0, max_value=20))
def test_netpbm_truncated_payload_rejected(cut):
    """A payload shorter than the header promises must raise, never return
    garbage pixels."""
    from pimbloomfilters_spark.functions import multimodal

    rgb = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    blob = multimodal.encode_netpbm(rgb)
    if cut == 0:
        assert (multimodal.decode_netpbm(blob) == rgb).all()
    else:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            multimodal.decode_netpbm(blob[:-cut])


@settings(max_examples=40, deadline=None)
@given(idx=st.lists(st.integers(min_value=0, max_value=(1 << 14) - 1),
                    min_size=0, max_size=400, unique=True),
       rho=st.lists(st.integers(min_value=1, max_value=51), min_size=400,
                    max_size=400))
def test_hll_payload_roundtrip_any_registers(idx, rho):
    """Sparse/dense HLL serialization round-trips for ARBITRARY register
    states (the format self-describes by first byte; register values <= 61
    can never alias the sparse tag)."""
    import numpy as np

    from pimbloomfilters_spark.sketches import HyperLogLog, sketch_from_bytes

    h = HyperLogLog(p=14)
    for i, j in enumerate(idx):
        h._regs[j] = rho[i]
    back = sketch_from_bytes(h.to_bytes())
    assert np.array_equal(back._regs, h._regs)
    # legacy raw payload path
    h2 = HyperLogLog(p=14)
    h2.set_data(h._regs.tobytes())
    assert np.array_equal(h2._regs, h._regs)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(
    st.one_of(st.none(),
              st.lists(st.integers(min_value=0, max_value=2**32 - 1),
                       min_size=0, max_size=20)),
    min_size=1, max_size=12),
    shingle=st.integers(min_value=1, max_value=2))
def test_batch_distinct_list_shingles_matches_reference(rows, shingle):
    """The Arrow list-array shingle extractor (zero-copy flatten, boundary
    masking, base-2^32 packing, lexsort dedup) must agree with a per-row
    Python reference for arbitrary token arrays including empty, null, and
    full-range uint32 ids — and must honor Arrow slice offsets."""
    import numpy as np
    import pyarrow as pa

    from pimbloomfilters_spark.functions.dedup import _batch_distinct_list_shingles

    arr = pa.array(rows, type=pa.list_(pa.int64()))
    for sliced in (arr, arr.slice(1) if len(rows) > 1 else arr):
        packed, starts, doc_idx = _batch_distinct_list_shingles(sliced, shingle)
        offset = len(rows) - len(sliced)
        expect = {}
        for i in range(len(sliced)):
            toks = rows[offset + i]
            s = set()
            for p in range(len(toks or []) - shingle + 1):
                v = 0
                for t in toks[p:p + shingle]:
                    v = (v << 32) | t
                s.add(v)
            if s:
                expect[i] = s
        bounds = list(starts) + [len(packed)]
        got = {int(d): {int(x) for x in packed[bounds[j]:bounds[j + 1]]}
               for j, d in enumerate(doc_idx)}
        assert got == expect


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(sizes=st.lists(st.integers(min_value=1, max_value=120),
                      min_size=1, max_size=60),
       cap=st.integers(min_value=8, max_value=128))
def test_pack_bins_greedy_invariants(sizes, cap):
    """The driver-side greedy inside pack_bins_best_fit (exercised via its
    pandas body on one group): every emitted bin fits the capacity, every
    fitting doc is packed exactly once, oversize docs are dropped, at most
    one bin is <= half full, and the run is deterministic."""
    from pimbloomfilters_spark.functions.packing import _bfd_assign

    L = cap
    fitting = sorted((n for n in sizes if n <= L), reverse=True)
    bins = _bfd_assign(fitting, L)  # the REAL placement code
    assert len(bins) == len(fitting)
    fills: dict = {}
    for n, b in zip(fitting, bins):
        fills[b] = fills.get(b, 0) + n
    assert all(v <= L for v in fills.values())
    assert sum(1 for v in fills.values() if v * 2 <= L) <= 1
    total = sum(fills.values())
    if total:
        assert len(fills) <= (2 * total + L - 1) // L + 1
    assert _bfd_assign(fitting, L) == bins  # deterministic


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(
    st.tuples(st.booleans(), st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=80))
def test_counting_bloom_random_insert_delete_no_fn(ops):
    """Under ANY interleaving of inserts and (valid) deletes, every item
    with a positive net count is a member — counting cells make deletion
    FN-free — and invalid deletes raise without corrupting state."""
    import collections

    import numpy as np

    from pimbloomfilters_spark.sketches import make_sketch

    cb = make_sketch("countingbloom", size2=14, nb_hash=4)
    ref: collections.Counter = collections.Counter()
    for is_insert, key in ops:
        if is_insert:
            cb.insert_bulk(np.array([key], dtype=np.int64))
            ref[key] += 1
        elif ref[key] > 0:
            cb.delete_bulk(np.array([key], dtype=np.int64))
            ref[key] -= 1
        else:
            before = cb._counters.copy()
            try:
                cb.delete_bulk(np.array([key], dtype=np.int64))
            except ValueError:
                assert (cb._counters == before).all()
            else:
                pass  # FP cells allowed the delete: documented caveat
    present = np.array([k for k, c in ref.items() if c > 0], dtype=np.int64)
    if present.size:
        assert cb.contains_bulk(present).all()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(samples=st.lists(st.integers(min_value=-32768, max_value=32767),
                        min_size=0, max_size=300),
       rate=st.sampled_from([8000, 16000, 44100]))
def test_wav_codec_roundtrip_and_rejection(samples, rate):
    """WAV encode/decode round-trips arbitrary int16 PCM exactly; corrupt
    or non-PCM payloads are rejected, never silently mis-decoded."""
    import numpy as np
    import pytest as _pt

    from pimbloomfilters_spark.functions.multimodal import decode_wav, encode_wav

    s = np.array(samples, dtype=np.int16)
    blob = encode_wav(s, rate)
    back, r = decode_wav(blob)
    assert r == rate and np.array_equal(back, s)
    with _pt.raises(ValueError):
        decode_wav(b"RIFX" + blob[4:])  # wrong magic
    if len(blob) > 50:
        with _pt.raises(ValueError):
            # truncate inside the data chunk: declared size > available
            decode_wav(blob[:-7])


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1),
             min_size=0, max_size=25),
    min_size=1, max_size=10),
    n=st.integers(min_value=1, max_value=6))
def test_token_ngram_codes_match_reference(rows, n):
    """The flat KR n-gram coder (boundary masking, Horner mod 2^31-1,
    lexsort dedup) must agree with a per-row Python reference for
    arbitrary token arrays including empty and shorter-than-n rows."""
    import pyarrow as pa

    from pimbloomfilters_spark.functions.dedup import (
        _batch_distinct_token_ngram_codes)

    col = pa.array(rows, type=pa.list_(pa.int64()))
    codes, starts, doc_idx = _batch_distinct_token_ngram_codes(col, n)
    P, B = (1 << 31) - 1, 257
    expect = {}
    for i, toks in enumerate(rows):
        s = set()
        for p in range(len(toks) - n + 1):
            v = 0
            for t in toks[p:p + n]:
                v = (v * B + t) % P
            s.add(v)
        if s:
            expect[i] = s
    got = {}
    bounds = list(starts) + [len(codes)]
    for j, d in enumerate(doc_idx):
        got[int(d)] = set(int(x) for x in codes[bounds[j]:bounds[j + 1]])
    assert got == expect


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1),
             min_size=3, max_size=25),
    min_size=2, max_size=10),
    offset=st.integers(min_value=0, max_value=3))
def test_token_ngram_codes_sliced_batch(rows, offset):
    """A SLICED Arrow list array (offsets not starting at 0 — what Spark
    hands mapInArrow mid-stream) must code identically to the unsliced
    equivalent."""
    import pyarrow as pa

    from pimbloomfilters_spark.functions.dedup import (
        _batch_distinct_token_ngram_codes)

    offset = min(offset, len(rows) - 1)
    full = pa.array(rows, type=pa.list_(pa.int64()))
    sliced = full.slice(offset)
    plain = pa.array(rows[offset:], type=pa.list_(pa.int64()))
    a = _batch_distinct_token_ngram_codes(sliced, 3)
    b = _batch_distinct_token_ngram_codes(plain, 3)
    assert [x.tolist() for x in a] == [x.tolist() for x in b]


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(
    st.lists(st.integers(min_value=0, max_value=2**31 - 1),
             min_size=1, max_size=25),
    min_size=2, max_size=10),
    offset=st.integers(min_value=0, max_value=3))
def test_token_ngram_pos_codes_sliced_batch(rows, offset):
    """The POSITIONAL coder must honor Arrow slice offsets too, and its
    (pos, code) stream must agree with a per-row Python reference."""
    import pyarrow as pa

    from pimbloomfilters_spark.functions.dedup import (
        _batch_token_ngram_pos_codes)
    from pimbloomfilters_spark.functions.text import _FP_BASE, _FP_MOD

    n = 3
    offset = min(offset, len(rows) - 1)
    full = pa.array(rows, type=pa.list_(pa.int64()))
    sliced = full.slice(offset)
    plain = pa.array(rows[offset:], type=pa.list_(pa.int64()))
    a = _batch_token_ngram_pos_codes(sliced, n)
    b = _batch_token_ngram_pos_codes(plain, n)
    assert [x.tolist() for x in a] == [x.tolist() for x in b]
    # reference: every window of every row, 1-based positions
    expect = []
    for ri, r in enumerate(rows[offset:]):
        for p in range(len(r) - n + 1):
            code = 0
            for t in r[p:p + n]:
                code = (code * _FP_BASE + t) % _FP_MOD
            expect.append((ri, p + 1, code))
    got = list(zip(b[2].tolist(), b[1].tolist(), b[0].tolist()))
    assert got == expect


@settings(max_examples=80, deadline=None)
@given(vals=st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                     min_size=0, max_size=300))
def test_exact_int_sum_matches_python(vals):
    """The arbitrary-precision sums must equal Python's exact big-int
    arithmetic for the FULL int64 range — plain sums via wraparound +
    float hint, sums of squares via the 32-bit hi/lo split (a full-range
    square is ~2^126, where a single float hint's error exceeds the 2^64
    recovery bound; xxhash64-valued columns are first-class here)."""
    from pimbloomfilters_spark.operators.profile import _exact_int_sum

    v = np.asarray(vals, dtype=np.int64)
    if v.size == 0:
        return
    assert _exact_int_sum(v) == sum(int(x) for x in vals)
    assert _exact_int_sum(v, squares=True) == sum(int(x)**2 for x in vals)
