"""Deterministic synthetic token-sequence generator (FIXTURES.md §1).

Shape: (doc_id string, tokens array<int32>, n_tok int32, source string).
Every value is a pure function of the row id via splitmix64 streams — no RNG
state, no wall clock — so the table is identical under ANY partitioning or
parallelism level. That property is what makes the N-vs-4N-core scaling
benchmark apples-to-apples and resumable builds reproducible.

Distributions (FIXTURES.md): lognormal-ish lengths clipped to [1, 2048];
Zipf-skewed token ids over a 2^17 vocabulary (heavy hitters by construction);
~8 sources with one holding ~60% of rows (exercises salted repartitioning).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..hashing import splitmix64

VOCAB_BITS = 17
VOCAB = 1 << VOCAB_BITS
MAX_LEN = 2048
N_SOURCES = 8
# source share: src0 gets 60%, the rest split the remainder
_SOURCE_CDF = np.cumsum([0.60] + [0.40 / (N_SOURCES - 1)] * (N_SOURCES - 1))

TOKEN_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def _uniform01(ids: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic U(0,1) per id for a given stream id."""
    h = splitmix64(ids.astype(np.uint64) ^ np.uint64(0xABCD0000 + stream))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _row_lengths(ids: np.ndarray, mean_len: float) -> np.ndarray:
    """Lognormal-ish via Box–Muller on two deterministic uniforms."""
    u1 = np.clip(_uniform01(ids, 1), 1e-12, 1.0)
    u2 = _uniform01(ids, 2)
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    mu = np.log(mean_len) - 0.5  # sigma=1 lognormal with ~mean_len median*e^.5
    return np.clip(np.exp(mu + 1.0 * z), 1, MAX_LEN).astype(np.int32)


def _zipf_tokens(flat_ids: np.ndarray) -> np.ndarray:
    """Zipf-skewed token id in [1, VOCAB] per flat position id:
    inverse-transform u -> floor(VOCAB * u^a) concentrates mass at low ids."""
    u = _uniform01(flat_ids, 3)
    return (np.power(u, 4.0) * (VOCAB - 1)).astype(np.int32) + 1


def _sources(ids: np.ndarray) -> np.ndarray:
    u = _uniform01(ids, 4)
    idx = np.searchsorted(_SOURCE_CDF, u)
    return np.minimum(idx, N_SOURCES - 1)


def generate_pdf(ids: np.ndarray, mean_len: float = 54.0) -> pd.DataFrame:
    """Deterministic pandas chunk for the given row ids."""
    ids = np.asarray(ids, dtype=np.int64)
    lens = _row_lengths(ids, mean_len)
    offsets = np.concatenate([[0], np.cumsum(lens.astype(np.int64))])
    total = int(offsets[-1])
    # flat position id = row_id * 2^12 + pos (lens <= 2048 < 2^12)
    row_rep = np.repeat(ids, lens)
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
    flat_ids = (row_rep << 12) | pos_in_row
    toks = _zipf_tokens(flat_ids)
    token_lists = np.split(toks, offsets[1:-1])
    src_idx = _sources(ids)
    return pd.DataFrame(
        {
            "doc_id": [f"doc-{i:010d}" for i in ids],
            "tokens": token_lists,
            "n_tok": lens,
            "source": [f"src{j}" for j in src_idx],
        }
    )


def generate_token_sequences(spark: SparkSession, n_rows: int,
                             mean_len: float = 54.0,
                             num_partitions: int | None = None,
                             start_id: int = 0) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas.
    Content depends only on row ids, never on partitioning."""

    def _gen(batches):
        for pdf in batches:
            yield generate_pdf(pdf["id"].to_numpy(), mean_len)

    rng = spark.range(start_id, start_id + n_rows, numPartitions=num_partitions)
    return rng.mapInPandas(_gen, schema=TOKEN_SCHEMA)
