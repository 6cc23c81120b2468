"""BPE merge learning: exact parity with a reference sequential trainer,
lossless re-encoding, overlap (a==b) greedy semantics, checkpointed and
batched variants."""

from collections import Counter

import pytest

from pimbloomfilters_spark.functions.bpe import (
    apply_bpe, decode_tokens, learn_bpe, pair_counts, vocab_truncate)


def _ref_apply_one(s, a, b, nid):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_bpe(seqs, n_merges, start_id, min_count=2):
    """Reference sequential BPE: count every adjacent position (overlaps
    included), pick (max count, then smallest packed (a,b) code), apply
    leftmost-greedy. Mirrors Sennrich et al. 2016's learner."""
    seqs = [list(s) for s in seqs]
    merges, nid = [], start_id
    for k in range(n_merges):
        c = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c:
            break
        (a, b), cnt = min(c.items(),
                          key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if cnt < min_count:
            break
        merges.append({"merge_idx": k, "a": a, "b": b,
                       "new_id": nid, "cnt": cnt})
        seqs = [_ref_apply_one(s, a, b, nid) for s in seqs]
        nid += 1
    return merges, seqs


_CORPUS = [
    [1, 2, 3, 1, 2, 3, 1, 2],          # (1,2) dominates, then (12,3)
    [2, 3, 2, 3, 5, 1, 2, 3],
    [7, 7, 7, 7, 7, 1, 2],             # a==b overlap runs
    [5, 5, 1, 2, 3, 5, 5],
    [9],                               # too short for any pair
    [],                                # empty
    [3, 1, 2, 3, 1, 2, 3],
]


def _df(spark, seqs):
    return spark.createDataFrame([(i, list(s)) for i, s in enumerate(seqs)],
                                 "doc_id long, tokens array<int>")


def test_learn_bpe_matches_reference_exactly(spark):
    df = _df(spark, _CORPUS)
    got = learn_bpe(df, 10, start_id=100, checkpoint_every=3)
    ref, ref_seqs = _ref_bpe(_CORPUS, 10, start_id=100)
    assert got == ref
    # applying the learned table reproduces the reference's final corpus
    enc = {r["doc_id"]: r["tokens"] for r in
           apply_bpe(df, got).collect()}
    assert [enc[i] for i in range(len(_CORPUS))] == ref_seqs


def test_apply_bpe_roundtrips_losslessly(spark):
    df = _df(spark, _CORPUS)
    merges = learn_bpe(df, 8, start_id=100)
    enc = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges).collect()}
    for i, orig in enumerate(_CORPUS):
        assert decode_tokens(enc[i], merges) == list(orig)
    # no learned pair survives adjacent in the encoded corpus
    pairs = {(m["a"], m["b"]) for m in merges}
    for toks in enc.values():
        assert not any((x, y) in pairs for x, y in zip(toks, toks[1:]))


def test_overlap_run_semantics(spark):
    """aaaa -> (aa)(aa); aaa -> (aa)a — leftmost-first greedy, exactly
    the reference behavior."""
    seqs = [[7] * 4, [7] * 3, [7] * 5]
    df = _df(spark, seqs)
    merges = learn_bpe(df, 1, start_id=50)
    assert [(m["a"], m["b"], m["new_id"]) for m in merges] == [(7, 7, 50)]
    assert merges[0]["cnt"] == 3 + 2 + 4   # every adjacent position counted
    enc = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges).collect()}
    assert enc[0] == [50, 50]
    assert enc[1] == [50, 7]
    assert enc[2] == [50, 50, 7]


def test_min_count_early_stop_and_empty(spark):
    df = _df(spark, [[1, 2], [3, 4], [5]])   # every pair unique
    assert learn_bpe(df, 5, start_id=10) == []            # min_count=2
    one = learn_bpe(df, 5, start_id=10, min_count=1)
    assert len(one) == 2                      # (1,2) and (3,4) merge once
    assert learn_bpe(_df(spark, [[], []]), 3, start_id=10,
                     min_count=1) == []


def test_batched_learning_is_valid_encoding(spark):
    """batch_merges > 1 may deviate from strict greedy RANK, but the
    result must still be a lossless encoding whose merges are
    symbol-disjoint within each batch round."""
    df = _df(spark, _CORPUS)
    merges = learn_bpe(df, 8, start_id=100, batch_merges=3,
                       checkpoint_every=2)
    assert len(merges) >= 3
    assert [m["new_id"] for m in merges] == list(range(100, 100 + len(merges)))
    enc = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges).collect()}
    for i, orig in enumerate(_CORPUS):
        assert decode_tokens(enc[i], merges) == list(orig)


def test_pair_counts_exact(spark):
    df = _df(spark, [[1, 2, 1, 2], [2, 1]])
    got = {r["code"]: r["cnt"] for r in pair_counts(df).collect()}
    assert got == {(1 << 32) + 2: 2, (2 << 32) + 1: 2}


def test_learn_bpe_rejects_bad_args(spark):
    df = _df(spark, [[1, 2]])
    with pytest.raises(ValueError, match="n_merges"):
        learn_bpe(df, -1)
    with pytest.raises(ValueError, match="batch_merges"):
        learn_bpe(df, 1, batch_merges=0)


def test_null_tokens_rows_stay_null(spark):
    """apply_bpe (and the trainer's internal re-encode) must preserve
    NULL tokens rows as NULL — the same contract remove_token_spans
    keeps — never silently coerce them to empty arrays."""
    rows = [(0, [1, 2, 1, 2]), (1, None), (2, [])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    merges = learn_bpe(df, 1, start_id=10)
    assert len(merges) == 1
    enc = {r["doc_id"]: r["tokens"] for r in apply_bpe(df, merges).collect()}
    assert enc[0] == [10, 10]
    assert enc[1] is None
    assert enc[2] == []


def _ref_truncate(seqs, top_v, unk):
    c = Counter(t for s in seqs if s is not None for t in s)
    keep = {t for t, _ in sorted(c.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:top_v]}
    return [None if s is None else
            [t if t in keep else unk for t in s] for s in seqs]


def test_vocab_truncate_matches_reference(spark):
    seqs = [[1, 2, 3, 1, 2], [4, 4, 4, 2], [5, 6, 1], None, [], [7]]
    df = spark.createDataFrame(
        [(i, s, f"s{i}") for i, s in enumerate(seqs)],
        "doc_id long, tokens array<long>, src string")
    for top_v in (1, 2, 3, 100):
        got = {r["doc_id"]: r["tokens"] for r in
               vocab_truncate(df, top_v, unk_id=0).collect()}
        ref = _ref_truncate(seqs, top_v, 0)
        assert [got[i] for i in range(len(seqs))] == ref
    # non-token columns pass through untouched; schema order preserved
    out = vocab_truncate(df, 2, unk_id=0)
    assert out.columns == ["doc_id", "tokens", "src"]
    assert {r["src"] for r in out.collect()} == {f"s{i}"
                                                 for i in range(len(seqs))}
    with pytest.raises(ValueError, match="top_v"):
        vocab_truncate(df, 0)


def test_vocab_truncate_tie_break_and_unk_id(spark):
    """Equal counts break toward the SMALLER id (deterministic), and a
    non-zero unk_id is honored even when it collides with a kept id."""
    df = spark.createDataFrame([(0, [10, 20, 30])],
                               "doc_id long, tokens array<long>")
    got = vocab_truncate(df, 2, unk_id=99).collect()[0]["tokens"]
    assert got == [10, 20, 99]          # 30 loses the tie, remapped to 99
    got2 = vocab_truncate(df, 2, unk_id=10).collect()[0]["tokens"]
    assert got2 == [10, 20, 10]


def test_out_of_range_ids_rejected(spark):
    """Pre-packed ids >= 2^31 would silently wrap the int64 pair codes;
    pair_counts must reject them up front, and learn_bpe must reject a
    start_id whose minted ids would leave the packable range."""
    bad = spark.createDataFrame([(0, [2 ** 31, 5])],
                                "doc_id long, tokens array<long>")
    with pytest.raises(Exception, match="token ids"):
        pair_counts(bad).collect()
    ok = _df(spark, [[1, 2, 1, 2]])
    with pytest.raises(ValueError):
        learn_bpe(ok, 2, start_id=2 ** 31 - 1)
