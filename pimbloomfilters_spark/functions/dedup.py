"""Deduplication operators for training-data pipelines.

Five families, each the standard published technique re-expressed Spark-first:

- exact          : groupBy content hash, keep min doc_id (pure relational)
- n-gram Jaccard : exact set similarity via shingle join (relational; the
                   small-scale oracle for the approximate families)
- MinHash + LSH  : signatures in one vectorized pass, banding relational,
                   candidates exact-verified — output equals exact pairs
                   above threshold whenever LSH recall is 1 (gated at sf0.01)
- SimHash        : 64-bit sign-sum sketch, Hamming-band candidates
- embedding cosine: near-dup pairs above a cosine threshold (brute force at
                   small scale; see similarity.py for the LSH/ANN scale path)

Scale notes: the shingle join explodes |doc|x|grams| — at 100 TB you run
MinHash banding FIRST (cost ~ O(corpus) + O(bucket^2) within tiny buckets)
and the exact verify only on candidates, which is precisely the composition
implemented by ``minhash_near_dup_pairs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

from ..hashing import xxh64_u64


# --------------------------------------------------------------- exact
def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, group_size): one kept representative (min doc_id) per exact
    content group."""
    return (
        df.groupBy(F.col(text_col))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("group_size"))
        .select("doc_id", "group_size")
    )


# --------------------------------------------------------- char n-grams
def char_ngrams(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, gram) distinct char n-grams — expressed as a JVM-side
    sequence/transform (no UDF)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - n + 1, F.lit(0))),
        lambda i: F.col(text_col).substr(i, F.lit(n)),
    )
    return (
        df.select("doc_id", F.explode(grams).alias("gram"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over distinct char n-grams for every pair sharing >= 1
    gram: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold."""
    grams = char_ngrams(df, text_col, n).cache()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sz_a), "doc_a").join(F.broadcast(sz_b), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------------- MinHash
def minhash_signatures(df: DataFrame, text_col: str = "text", n: int = 3,
                       num_hashes: int = 64, seed: int = 7) -> DataFrame:
    """(doc_id, sig array<long>): MinHash over char n-gram xxhashes, all
    hashes derived by the splitmix/affine trick h_j = xxh64(g, s+j) computed
    as one (grams x num_hashes) numpy broadcast per batch."""

    def _sig(batches):
        for b in batches:
            ids = b.column(0)
            texts = b.column(1).to_pylist()
            out = []
            for t in texts:
                t = t or ""
                if len(t) < n:
                    out.append([np.iinfo(np.int64).max] * num_hashes)
                    continue
                enc = t.encode("utf-8", "ignore")
                raw = np.frombuffer(enc, dtype=np.uint8)
                w = np.lib.stride_tricks.sliding_window_view(raw, min(n, raw.size))
                # pack each n-byte gram into a uint64 (n<=8) then mix per seed
                with np.errstate(over="ignore"):
                    packed = np.zeros(w.shape[0], dtype=np.uint64)
                    for i in range(w.shape[1]):
                        packed = packed * np.uint64(131) + w[:, i].astype(np.uint64)
                packed = np.unique(packed)
                sig = np.empty(num_hashes, dtype=np.uint64)
                for j in range(num_hashes):
                    sig[j] = xxh64_u64(packed, seed + j).min()
                out.append(sig.astype(np.int64).tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.list_(pa.int64()))],
                names=["doc_id", "sig"],
            )

    id_type = dict(df.dtypes)["doc_id"]
    return df.select("doc_id", text_col).mapInArrow(
        _sig, f"doc_id {id_type}, sig array<long>"
    )


def minhash_lsh_candidates(sig_df: DataFrame, bands: int = 16) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing >= 1 LSH band bucket. Banding is
    pure relational: explode band slices, hash each slice, self-join buckets."""
    banded = sig_df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.slice(
                        F.col("sig"),
                        i * (F.size("sig") / bands).cast("int") + 1,
                        (F.size("sig") / bands).cast("int"),
                    ).cast("string")
                ),
            )
        ).alias("band", "bucket"),
    )
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )


def minhash_near_dup_pairs(df: DataFrame, text_col: str = "text", n: int = 3,
                           threshold: float = 0.7, num_hashes: int = 64,
                           bands: int = 32) -> DataFrame:
    """LSH candidates -> candidate-restricted exact Jaccard verify >= t.

    Banding r = num_hashes/bands = 2 rows/band: P[candidate | j >= 0.7]
    = 1-(1-0.49)^32 ~ 1-2e-10, so the output equals the exact pair set at
    this threshold (gated against the exact oracle at sf0.01). The verify
    join touches only candidate pairs — at corpus scale that is the whole
    point: O(corpus) signatures + O(bucket^2) candidates, never all pairs."""
    sigs = minhash_signatures(df, text_col, n, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands)
    grams = char_ngrams(df, text_col, n).cache()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        cands.join(ga, "doc_a").join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sz_a), "doc_a").join(F.broadcast(sz_b), "doc_b")
        .withColumn("jaccard", F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ------------------------------------------------------------- SimHash
def simhash_signatures(df: DataFrame, text_col: str = "text", n: int = 3,
                       seed: int = 11) -> DataFrame:
    """(doc_id, simhash long): 64-bit sign-sum of gram hash bits."""

    def _sim(batches):
        bitcols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        for b in batches:
            ids = b.column(0)
            texts = b.column(1).to_pylist()
            out = np.empty(len(texts), dtype=np.int64)
            for r, t in enumerate(texts):
                t = t or ""
                raw = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
                if raw.size < n:
                    out[r] = 0
                    continue
                w = np.lib.stride_tricks.sliding_window_view(raw, n)
                with np.errstate(over="ignore"):
                    packed = np.zeros(w.shape[0], dtype=np.uint64)
                    for i in range(n):
                        packed = packed * np.uint64(131) + w[:, i].astype(np.uint64)
                h = xxh64_u64(np.unique(packed), seed)
                # vote per bit: +1 if set else -1; sign of sum -> bit
                bits = (h[:, None] & bitcols[None, :]) != 0
                votes = bits.sum(axis=0) * 2 - bits.shape[0]
                out[r] = int(((votes > 0) * bitcols).sum(dtype=np.uint64).astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out)], names=["doc_id", "simhash"]
            )

    id_type = dict(df.dtypes)["doc_id"]
    return df.select("doc_id", text_col).mapInArrow(
        _sim, f"doc_id {id_type}, simhash long"
    )


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           max_hamming: int = 3, n: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within Hamming distance via 4x16-bit
    band blocking (any pair with distance <= 3 shares at least one exact
    16-bit band — pigeonhole), then exact popcount verify."""
    sigs = simhash_signatures(df, text_col, n).cache()
    banded = sigs.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                 .bitwiseAND(F.lit(0xFFFF))
                for i in range(4)
            ])
        ).alias("band", "bucket"),
    )
    l = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
                      "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
                      "band", "bucket")
    pairs = (
        l.join(r, ["band", "bucket"]).filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("doc_a", "doc_b", "hamming")


# ------------------------------------------------- embedding near-dup
def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.95) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= threshold. Brute force via the
    vectorized numpy path (see similarity.cosine_matrix_pairs); exact and
    oracle-checkable at small scale."""
    from .similarity import cosine_pairs_bruteforce

    return cosine_pairs_bruteforce(df, vec_col, id_col, threshold)
