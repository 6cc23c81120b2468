"""Structured Streaming sketch maintenance.

The reference is strictly batch (SURVEY.md §2.4: no streaming state); these
operators extend the same mergeable-sketch algebra to unbounded input — the
property that makes a sketch *streamable* is exactly the one that makes it
partition-parallel: associative, commutative merge.

Shapes:

1. ``sketch_stream_query`` / ``dedup_stream_query`` — foreachBatch: every
   micro-batch builds partials with the batch engine and merges them into a
   running sketch, snapshotted durably per batch next to the checkpoint and
   reloaded on start (driver restarts lossless; replayed batches already in
   the snapshot are skipped — exactly-once for every sketch kind).

2. ``sharded_dedup_stream`` — the filter lives EXECUTOR-side as per-shard
   GroupState in the state store (nothing re-ships per batch, restart-safe
   transactionally with the offsets, memory scales out with n_shards).

3. ``windowed_distinct_stream`` / ``windowed_heavy_hitters_stream`` /
   ``windowed_quantiles_stream`` — applyInPandasWithState: per event-time
   window (tumbling or sliding) an HLL / Misra–Gries / KLL is GroupState;
   EventTimeTimeout evicts window state once the watermark passes.

4. ``session_stream`` — gap-based sessionization as per-user GroupState:
   closed sessions emit on in-batch gaps or via EventTimeTimeout when the
   user goes idle; state is one row per active user.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.build import build_partials, merge_partial_rows
from ..sketches import Sketch, sketch_from_bytes

# driver-side registry of running sketches, keyed by query name
_RUNNING: dict[str, Sketch] = {}
# highest batch id whose contribution is already inside the persisted snapshot
_PERSISTED_BATCH: dict[str, int] = {}
# which query KIND owns each name this session: the sketch/dedup/profile
# registries above are keyed by name, so a name reused across kinds would
# cross-contaminate the replay-skip watermark and silently skip batches
_KIND: dict[str, str] = {}


def _claim(name: str, kind: str) -> None:
    prev = _KIND.get(name)
    if prev is not None and prev != kind:
        raise ValueError(
            f"stream query name {name!r} already belongs to a {prev} query "
            f"in this session; use a distinct name per query kind")
    _KIND[name] = kind


def get_stream_sketch(name: str) -> Sketch | None:
    return _RUNNING.get(name)


# -- durable sketch snapshots -------------------------------------------------
# Structured Streaming durably commits batch OFFSETS to checkpointLocation;
# the running sketch must be equally durable or a driver restart resumes past
# committed batches with an empty sketch (silently losing every prior key).
# Snapshot-per-batch next to the checkpoint dir: write temp + atomic rename,
# reload the newest on start, and skip re-merging any replayed batch whose id
# is already covered by the loaded snapshot (making CMS/KLL replays exactly-
# once as well). Local-filesystem checkpoints only (this sandbox); an object-
# store deployment would swap these two helpers for put/list calls.

def _state_dir(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir.removeprefix("file:"), "sketch_state")


def load_persisted_sketch(checkpoint_dir: str) -> tuple[Sketch | None, int]:
    """(sketch, batch_id) of the newest snapshot, or (None, -1)."""
    d = _state_dir(checkpoint_dir)
    best, path = -1, None
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return None, -1
    for f in names:
        if f.startswith("batch_") and f.endswith(".bin"):
            bid = int(f[6:-4])
            if bid > best:
                best, path = bid, os.path.join(d, f)
    if path is None:
        return None, -1
    with open(path, "rb") as fh:
        return sketch_from_bytes(fh.read()), best


def persist_sketch(checkpoint_dir: str, batch_id: int, sk: Sketch) -> None:
    d = _state_dir(checkpoint_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".batch_{batch_id}.tmp")
    with open(tmp, "wb") as fh:
        fh.write(sk.to_bytes())
    os.replace(tmp, os.path.join(d, f"batch_{batch_id:012d}.bin"))
    stale = sorted(
        f for f in os.listdir(d) if f.startswith("batch_") and f.endswith(".bin")
    )[:-2]  # keep the two newest snapshots
    for f in stale:
        try:
            os.remove(os.path.join(d, f))
        except OSError:
            pass


def _resume_state(name: str, checkpoint_dir: str) -> None:
    _RUNNING.pop(name, None)
    sk, bid = load_persisted_sketch(checkpoint_dir)
    _PERSISTED_BATCH[name] = bid
    if sk is not None:
        _RUNNING[name] = sk


def sketch_stream_query(
    stream_df: DataFrame,
    col: str,
    make: Callable[[], Sketch],
    name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a streaming query that folds every micro-batch into a running
    sketch (readable via ``get_stream_sketch(name)``). The running sketch is
    snapshotted per batch next to the checkpoint and reloaded on start, so a
    driver restart resumes with all prior keys; replayed batches already in
    the snapshot are skipped (exactly-once for every sketch kind)."""
    _claim(name, "sketch")
    _resume_state(name, checkpoint_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _PERSISTED_BATCH.get(name, -1):
            return  # replay of a batch the loaded snapshot already contains
        if batch_df.isEmpty():
            return
        partial, _ = merge_partial_rows(build_partials(batch_df, col, make).collect())
        cur = _RUNNING.get(name)
        sk = partial if cur is None else cur.merge(partial)
        _RUNNING[name] = sk
        persist_sketch(checkpoint_dir, batch_id, sk)
        _PERSISTED_BATCH[name] = batch_id

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# TTL companions to the single-sketch snapshot: previous-generation blob +
# generation-start timestamp, written atomically next to batch_N.bin. Only
# the TTL'd dedup stream reads/writes these; the non-TTL paths are untouched.
_PREV: dict[str, Sketch | None] = {}
_GEN_START: dict[str, int] = {}


def _persist_ttl_extras(checkpoint_dir: str, batch_id: int,
                        prev: Sketch | None, gen_start_ms: int) -> None:
    d = _state_dir(checkpoint_dir)
    os.makedirs(d, exist_ok=True)
    blob = prev.to_bytes() if prev is not None else b""
    tmp = os.path.join(d, f".batch_{batch_id}.ttl.tmp")
    with open(tmp, "wb") as fh:
        fh.write(gen_start_ms.to_bytes(8, "little") + blob)
    os.replace(tmp, os.path.join(d, f"batch_{batch_id:012d}.ttl"))
    stale = sorted(f for f in os.listdir(d) if f.endswith(".ttl"))[:-2]
    for f in stale:
        try:
            os.remove(os.path.join(d, f))
        except OSError:
            pass


def _load_ttl_extras(checkpoint_dir: str,
                     batch_id: int) -> tuple[Sketch | None, int]:
    """(prev_generation, gen_start_ms) persisted with snapshot batch_id."""
    path = os.path.join(_state_dir(checkpoint_dir),
                        f"batch_{batch_id:012d}.ttl")
    try:
        with open(path, "rb") as fh:
            raw = fh.read()
    except FileNotFoundError:
        return None, 0
    gen_start = int.from_bytes(raw[:8], "little")
    return (sketch_from_bytes(raw[8:]) if len(raw) > 8 else None), gen_start


def dedup_stream_query(
    stream_df: DataFrame,
    key_col: str,
    out_path: str,
    checkpoint_dir: str,
    size2: int = 26,
    nb_hash: int = 8,
    name: str = "bloom_dedup",
    ttl_ms: int | None = None,
):
    """Streaming drop-already-seen filter: every micro-batch is probed against
    a running Bloom filter of all keys seen so far; unseen rows are appended
    to ``out_path`` and their keys inserted. First occurrences always pass
    (no false negatives => nothing is wrongly treated as seen... the
    guarantee is the reverse of exact dedup's: a false POSITIVE drops a
    first occurrence with probability = FPR, the standard approximate-dedup
    trade — size the filter for the expected key cardinality).

    The 'seen' filter is snapshotted per batch and reloaded on restart (see
    the durable-snapshot helpers above), so resumed streams keep deduping
    against everything already emitted. A batch replayed after its parquet
    write but before the offset commit can still duplicate output rows —
    standard foreachBatch at-least-once for the sink side.

    ``ttl_ms`` bounds memory on an unbounded key universe by rotating
    generations (the same scheme as ``sharded_dedup_stream``): the filter
    pair (current, previous) remembers a key for >= ttl and <= 2*ttl after
    its generation started, then re-admits it. Each generation is a COMPLETE
    filter for the keys first seen in it, so membership is the OR of two
    independent probes — no bits-split-across-generations hazard. Rotation
    state survives restarts via a sidecar snapshot (.ttl) written atomically
    with each batch snapshot."""
    import functools as _ft
    import time

    from ..operators.build import build_partials, merge_partial_rows
    from ..operators.probe import probe_key_column
    from ..sketches import make_sketch

    _claim(name, "dedup")
    _resume_state(name, checkpoint_dir)
    _PREV.pop(name, None), _GEN_START.pop(name, None)
    if ttl_ms is not None and _PERSISTED_BATCH.get(name, -1) >= 0:
        prev, gen_start = _load_ttl_extras(checkpoint_dir,
                                           _PERSISTED_BATCH[name])
        _PREV[name], _GEN_START[name] = prev, gen_start
    factory = _ft.partial(make_sketch, "bloom", size2=size2, nb_hash=nb_hash)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _PERSISTED_BATCH.get(name, -1):
            return
        if batch_df.isEmpty():
            return
        seen = _RUNNING.get(name)
        prev, gen_start = _PREV.get(name), _GEN_START.get(name, 0)
        if ttl_ms is not None:
            now = int(time.time() * 1000)
            if gen_start == 0:
                gen_start = now  # first batch of a fresh query
            elif now - gen_start >= ttl_ms:
                # rotate; two+ TTLs idle -> both generations are stale
                prev = None if now - gen_start >= 2 * ttl_ms else seen
                seen, gen_start = None, now
        fresh = batch_df
        for gen in (seen, prev):
            if gen is not None:
                fresh = probe_key_column(fresh, gen, key_col).filter(
                    ~F.col("member")
                ).drop("member")
        # exact within-batch dedup (the filter only learns keys after the
        # whole batch); cross-batch dedup is the Bloom's job
        fresh = fresh.dropDuplicates([key_col]).persist()
        emitted = not fresh.isEmpty()
        if emitted:
            fresh.write.mode("append").parquet(out_path)
            partial, _ = merge_partial_rows(
                build_partials(fresh, key_col, factory).collect()
            )
            seen = partial if seen is None else seen.merge(partial)
        fresh.unpersist()
        if seen is None:
            return  # nothing learned yet and no rotation to record
        _RUNNING[name] = seen
        _PREV[name], _GEN_START[name] = prev, gen_start
        persist_sketch(checkpoint_dir, batch_id, seen)
        if ttl_ms is not None:
            _persist_ttl_extras(checkpoint_dir, batch_id, prev, gen_start)
        _PERSISTED_BATCH[name] = batch_id

    return (
        stream_df.writeStream.foreachBatch(_step)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


_HH_OUT = StructType([
    StructField("window_start", TimestampType()),
    StructField("item", LongType()),
    StructField("est_count", LongType()),
    StructField("n_rows", LongType()),
])
_HH_STATE = StructType(
    [StructField("mg", BinaryType()), StructField("n_rows", LongType())]
)


def windowed_heavy_hitters_stream(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    slide: str | None = None,
    k: int = 256,
    top: int = 10,
) -> DataFrame:
    """Per-event-time-window streaming heavy hitters via a Misra–Gries
    summary held as GroupState: each update emits the window's current top
    items with their (one-sided under-) estimates; any item whose true count
    exceeds n/(k+1) is guaranteed present. State is evicted once the
    watermark passes window_end + watermark (EventTimeTimeout), same
    discipline as ``windowed_distinct_stream``."""
    from ..sketches import MisraGries

    window_ms = _duration_ms(window)
    watermark_ms = _duration_ms(watermark)

    with_window = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window, slide or window)
                    .getField("start"))
        .withColumn("_k", F.col(key_col).cast("long"))
        .select("_w", "_k", ts_col)
    )

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (wstart,) = key
        if state.exists:
            blob, n = state.get
            mg = sketch_from_bytes(bytes(blob))
        else:
            mg, n = MisraGries(k=k), 0
        for pdf in pdfs:
            vals = pdf["_k"].to_numpy(dtype=np.int64)
            mg.insert_bulk(vals)
            n += len(vals)
        state.update((mg.to_bytes(), n))
        end_ms = int(pd.Timestamp(wstart).value // 1_000_000) + window_ms
        state.setTimeoutTimestamp(end_ms + watermark_ms)
        hh = mg.heavy_hitters()[:top]
        yield pd.DataFrame({
            "window_start": [wstart] * len(hh),
            "item": [item for item, _ in hh],
            "est_count": [est for _, est in hh],
            "n_rows": [n] * len(hh),
        })

    return with_window.groupBy("_w").applyInPandasWithState(
        _update,
        outputStructType=_HH_OUT,
        stateStructType=_HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_QT_OUT = StructType([
    StructField("window_start", TimestampType()),
    StructField("p50", DoubleType()),
    StructField("p95", DoubleType()),
    StructField("n_rows", LongType()),
])
_QT_STATE = StructType(
    [StructField("kll", BinaryType()), StructField("n_rows", LongType())]
)


def windowed_quantiles_stream(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    slide: str | None = None,
    kll_k: int = 200,
) -> DataFrame:
    """Per-event-time-window streaming quantiles (p50/p95) via a KLL sketch
    held as GroupState — completes the streaming trio next to distinct (HLL)
    and heavy hitters (Misra–Gries). Window state is evicted once the
    watermark passes window_end + watermark (EventTimeTimeout), so the state
    store stays bounded; each update re-emits the window's current estimates
    (update mode). Estimates carry KLL's O(1/k) normalized rank error."""
    from ..sketches import KLLSketch

    window_ms = _duration_ms(window)
    watermark_ms = _duration_ms(watermark)

    with_window = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window, slide or window)
                    .getField("start"))
        .withColumn("_v", F.col(value_col).cast("double"))
        .select("_w", "_v", ts_col)
    )

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (wstart,) = key
        if state.exists:
            blob, n = state.get
            kll = sketch_from_bytes(bytes(blob))
        else:
            kll, n = KLLSketch(k=kll_k), 0
        for pdf in pdfs:
            vals = pdf["_v"].to_numpy(dtype=np.float64)
            # nulls arrive as NaN and would sort to the top of the KLL
            # buffers, permanently poisoning the window's upper quantiles
            vals = vals[np.isfinite(vals)]
            kll.insert_bulk(vals)
            n += len(vals)
        state.update((kll.to_bytes(), n))
        end_ms = int(pd.Timestamp(wstart).value // 1_000_000) + window_ms
        state.setTimeoutTimestamp(end_ms + watermark_ms)
        yield pd.DataFrame({
            "window_start": [wstart],
            "p50": [kll.quantile(0.5)],
            "p95": [kll.quantile(0.95)],
            "n_rows": [n],
        })

    return with_window.groupBy("_w").applyInPandasWithState(
        _update,
        outputStructType=_QT_OUT,
        stateStructType=_QT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sharded_dedup_stream(
    stream_df: DataFrame,
    key_col: str,
    size2: int = 26,
    nb_hash: int = 8,
    n_shards: int = 32,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming drop-already-seen filter with the Bloom state held
    EXECUTOR-SIDE: the logical filter is split into ``n_shards`` disjoint
    bit-ranges (the sharded-build layout — a key's block, hence all its k
    bits, lives in exactly one shard), each shard's bitmap is GroupState in
    the Structured Streaming state store, and every micro-batch routes keys
    to their shard with the same JVM-side hash used by the batch operators.
    Keys are cast to long BEFORE routing (JVM xxhash64 of an int32 column
    hashes 4 bytes; the numpy path hashes the 8-byte value — an uncast int
    key would land in the wrong shard's state, see probe_bloom_distributed);
    the emitted key column is therefore always long.

    vs ``dedup_stream_query`` (foreachBatch + driver-held filter): nothing is
    re-shipped per batch (the foreachBatch path addFile's a fresh filter
    snapshot every micro-batch — O(batches x m/8) transfers), state survives
    driver restarts transactionally with the offsets (no side snapshots), and
    memory scales out: each executor holds only its shards' m/n_shards bits.
    Emits first occurrences (append mode); false positives drop a first
    occurrence with p = FPR, the standard approximate-dedup trade.

    ``ttl_ms=None``: dedup state never expires (NoTimeout) — right for
    bounded key domains. ``ttl_ms=N``: ROTATING-GENERATION expiry, the
    standard Bloom-TTL construction (bits cannot be deleted, so the filter
    keeps two generations): inserts go to the current generation, membership
    checks current OR previous, and when a generation is older than
    ``ttl_ms`` it is demoted to previous (the old previous is dropped). A key
    is remembered for at least ttl_ms and at most 2*ttl_ms after insertion;
    a long-idle shard's whole state is evicted via ProcessingTimeTimeout.
    State per shard doubles (two bitmaps) but stays bounded forever. Note:
    processing-time timers keep scheduling batches, so a TTL'd query under
    ``trigger(availableNow=True)`` does not self-terminate — run it with a
    processing-time trigger (it's for long-lived streams), or drain with
    ``processAllAvailable()`` + ``stop()`` in tests."""
    import math as _math

    from pyspark.sql.types import StructField as _SF, StructType as _ST

    from ..operators.sharded import _shard_expr
    from ..sketches.bloom import BLOCK_BITS, bloom_positions

    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two")
    if ttl_ms is not None and ttl_ms <= 0:
        raise ValueError("ttl_ms must be positive (or None for no expiry)")
    shard_bits = int(_math.log2(n_shards))
    shard_size_bits = (1 << size2) // n_shards
    n_words = shard_size_bits // 64
    out_schema = StructType([StructField(key_col, LongType())])
    # ttl_ms=None keeps the original 2-field state schema so pre-TTL
    # checkpoints restart cleanly (Spark rejects a state-schema change on
    # resume); the TTL variant is a NEW query shape with its own schema
    if ttl_ms is None:
        state_schema = _ST([_SF("bitmap", BinaryType()),
                            _SF("n_seen", LongType())])
    else:
        state_schema = _ST([
            _SF("bitmap", BinaryType()),       # current generation
            _SF("bitmap_prev", BinaryType()),  # previous generation
            _SF("gen_start_ms", LongType()),
            _SF("n_seen", LongType()),
        ])
    empty = b""

    def _positions(vals: np.ndarray, base: int) -> tuple[np.ndarray, np.ndarray]:
        pos = bloom_positions(vals, size2, nb_hash, 42, BLOCK_BITS) \
            - np.uint64(base)
        return (pos >> np.uint64(6)).astype(np.int64), \
            np.uint64(1) << (pos & np.uint64(63))

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # idle shard past TTL: drop everything
            state.remove()
            return
        (shard,) = key
        now = state.getCurrentProcessingTimeMs() if ttl_ms is not None else 0
        prev = None
        if state.exists:
            if ttl_ms is None:
                blob, n_seen = state.get
                gen_start = 0
            else:
                blob, blob_prev, gen_start, n_seen = state.get
                prev = (np.frombuffer(bytes(blob_prev), dtype=np.uint64).copy()
                        if blob_prev else None)
            words = np.frombuffer(bytes(blob), dtype=np.uint64).copy()
        else:
            words, gen_start, n_seen = \
                np.zeros(n_words, dtype=np.uint64), now, 0
        if ttl_ms is not None and now - gen_start >= ttl_ms:
            # rotate; two+ TTLs idle -> both generations are stale
            prev = None if now - gen_start >= 2 * ttl_ms else words
            words = np.zeros(n_words, dtype=np.uint64)
            gen_start = now
        base = shard * shard_size_bits
        out = []
        for pdf in pdfs:
            vals = pd.unique(pdf[key_col].to_numpy())  # in-batch exact dedup
            vals = np.asarray(vals, dtype=np.int64)
            w, bits = _positions(vals, base)
            # a key is seen iff ALL k bits are set in ONE generation —
            # OR-ing per-position hits across generations before the
            # all-reduce would count bits-split-across-generations as a
            # (false) member and drop first occurrences far above p = FPR
            seen = ((words[w] & bits) != 0).reshape(-1, nb_hash).all(axis=1)
            if prev is not None:
                seen |= ((prev[w] & bits) != 0).reshape(
                    -1, nb_hash).all(axis=1)
            fresh = vals[~seen]
            if fresh.size:  # reuse the probe positions for the insert
                fw = w.reshape(-1, nb_hash)[~seen].ravel()
                fbits = bits.reshape(-1, nb_hash)[~seen].ravel()
                np.bitwise_or.at(words, fw, fbits)
                n_seen += int(fresh.size)
                out.append(fresh)
        if ttl_ms is None:
            state.update((words.tobytes(), int(n_seen)))
        else:
            state.update((
                words.tobytes(),
                prev.tobytes() if prev is not None else empty,
                int(gen_start), int(n_seen),
            ))
            state.setTimeoutDuration(2 * ttl_ms)
        if out:
            yield pd.DataFrame({key_col: np.concatenate(out)})

    keyed = stream_df.select(
        F.col(key_col).cast("long").alias(key_col)
    ).withColumn("_shard", _shard_expr(key_col, shard_bits).cast("int"))
    return keyed.groupBy("_shard").applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if ttl_ms is not None else GroupStateTimeout.NoTimeout),
    )


_UNIT_MS = {"millisecond": 1, "second": 1_000, "minute": 60_000,
            "hour": 3_600_000, "day": 86_400_000}


def _duration_ms(s: str) -> int:
    """Parse Spark interval strings like '1 minute' / '30 seconds'."""
    n, unit = s.strip().split()
    return int(n) * _UNIT_MS[unit.rstrip("s")]


_WINDOW_OUT = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("estimate", LongType()),
        StructField("n_rows", LongType()),
    ]
)
_WINDOW_STATE = StructType(
    [StructField("hll", BinaryType()), StructField("n_rows", LongType())]
)


def windowed_distinct_stream(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    slide: str | None = None,
    hll_p: int = 12,
) -> DataFrame:
    """Per-event-time-window streaming distinct-count (HLL) via
    applyInPandasWithState. Late data beyond the watermark is dropped by
    Spark; window state IS evicted via EventTimeTimeout once the watermark
    passes window_end + watermark, so the state store stays bounded on a
    long-running stream."""
    from ..sketches import HyperLogLog

    window_ms = _duration_ms(window)
    watermark_ms = _duration_ms(watermark)

    with_window = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window, slide or window)
                    .getField("start"))
        .withColumn("_k", F.xxhash64(F.col(key_col).cast("string")))
        # the watermarked ts column must survive the projection or the
        # analyzer rejects EventTimeTimeout ("no watermark")
        .select("_w", "_k", ts_col)
    )

    def _update(key, pdfs, state: GroupState):
        if state.hasTimedOut:  # watermark passed window end: evict
            state.remove()
            return
        (wstart,) = key
        if state.exists:
            blob, n = state.get
            hll = sketch_from_bytes(bytes(blob))
        else:
            hll, n = HyperLogLog(p=hll_p), 0
        for pdf in pdfs:
            vals = pdf["_k"].to_numpy(dtype=np.int64)
            hll.insert_bulk(vals)
            n += len(vals)
        state.update((hll.to_bytes(), n))
        end_ms = int(pd.Timestamp(wstart).value // 1_000_000) + window_ms
        state.setTimeoutTimestamp(end_ms + watermark_ms)
        yield pd.DataFrame(
            {
                "window_start": [wstart],
                "estimate": [int(round(hll.estimate()))],
                "n_rows": [n],
            }
        )

    return with_window.groupBy("_w").applyInPandasWithState(
        _update,
        outputStructType=_WINDOW_OUT,
        stateStructType=_WINDOW_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_SESS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
])
_SESS_STATE = StructType([
    # ALL sessions not yet watermark-final (closed-but-bridgeable + open),
    # parallel arrays ordered by start: a session is only emitted once the
    # watermark passes its end + gap, i.e. once no admissible event can
    # ever bridge/extend it
    StructField("starts", ArrayType(LongType())),
    StructField("lasts", ArrayType(LongType())),
    StructField("ns", ArrayType(LongType())),
])


def session_stream(
    stream_df: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization — the stateful twin of the batch
    ``user_sessions`` query: per user, consecutive events closer than
    ``gap`` belong to one session; a CLOSED session is emitted as
    (user_id, session_start, session_end, n_events).

    Mechanics: one GroupState row per user holds EVERY session that is not
    yet watermark-final — the open session plus any closed session whose
    end a still-admissible (within-watermark) late event could yet bridge.
    Each invocation re-sessionizes the stored sessions (as atoms — their
    internal gaps are <= gap by construction) together with the batch's
    events in time order, which is exactly the batch gap rule; a session
    is emitted only once the watermark passes its end + gap, at which
    point NO event Spark would still accept can extend or bridge it (an
    extending event t satisfies t <= end + gap < watermark, so it would be
    dropped upstream). Emission therefore never needs retraction and the
    output matches batch sessionization exactly, including the
    late-event-bridges-an-earlier-closed-session case. EventTimeTimeout
    flushes ripe sessions when a user simply stops. State per user is
    bounded by watermark-delay / gap sessions (one open session plus the
    few closed ones still inside the lateness horizon)."""
    gap_ms = _duration_ms(gap)

    src = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_u", F.col(user_col).cast("long"))
        .select("_u", F.col(ts_col).alias("_ts"))
    )

    def _ts_out(ms: int):
        return pd.Timestamp(ms, unit="ms")

    def _update(key, pdfs, state: GroupState):
        (user,) = key
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            st_s, st_e, st_c = state.get
            s = np.asarray(st_s, dtype=np.int64)
            e = np.asarray(st_e, dtype=np.int64)
            c = np.asarray(st_c, dtype=np.int64)
        else:
            s = e = c = np.empty(0, dtype=np.int64)
        if not state.hasTimedOut:
            ts = np.concatenate([
                pdf["_ts"].to_numpy(dtype="datetime64[ms]").astype(np.int64)
                for pdf in pdfs
            ])
            s = np.concatenate([s, ts])
            e = np.concatenate([e, ts])
            c = np.concatenate([c, np.ones(ts.size, dtype=np.int64)])
        if s.size == 0:
            state.remove()
            return
        # Sessionize stored sessions (atoms — internal gaps <= gap by
        # construction) and new events together in time order == the batch
        # gap rule. A within-watermark late event older than a stored
        # session joins it only when within `gap`; further away it forms
        # its own earlier session, which stays in STATE (not emitted) so a
        # later admissible event can still bridge it.
        # Vectorized gaps-and-islands (the old Python tuple sort + merge
        # loop dominated addBatch at 10^5 events/batch): sort intervals by
        # start; an interval opens a new session iff its start exceeds the
        # running max end of everything before it by more than gap (tie
        # order on equal starts cannot change the grouping: a same-start
        # interval always lands in the open session).
        order = np.argsort(s, kind="stable")
        s, e, c = s[order], e[order], c[order]
        cme = np.maximum.accumulate(e)  # running max end, inclusive
        new_sess = np.empty(s.size, dtype=bool)
        new_sess[0] = True
        np.greater(s[1:] - cme[:-1], gap_ms, out=new_sess[1:])
        heads = np.flatnonzero(new_sess)          # first index per session
        tails = np.r_[heads[1:] - 1, s.size - 1]  # last index per session
        m_s = s[heads]
        m_e = cme[tails]
        m_c = np.add.reduceat(c, heads)
        # ripe = untouchable by any future admissible event: an event t
        # extending/bridging [s, e] needs t <= e + gap, and Spark drops
        # t < watermark — so e + gap < wm means finality
        is_ripe = m_e + gap_ms < wm
        if is_ripe.all():
            state.remove()
        else:
            k_s, k_e, k_c = m_s[~is_ripe], m_e[~is_ripe], m_c[~is_ripe]
            state.update((k_s.tolist(), k_e.tolist(), k_c.tolist()))
            state.setTimeoutTimestamp(max(int(k_e.min()) + gap_ms, wm + 1))
        if is_ripe.any():
            yield pd.DataFrame({
                "user_id": np.full(int(is_ripe.sum()), user, dtype=np.int64),
                "session_start": pd.to_datetime(m_s[is_ripe], unit="ms"),
                "session_end": pd.to_datetime(m_e[is_ripe], unit="ms"),
                "n_events": m_c[is_ripe]})

    return src.groupBy("_u").applyInPandasWithState(
        _update,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def screen_stream(stream_df, sketch, n: int = 13,
                  tokens_col: str = "tokens", id_col: str = "doc_id"):
    """Streaming benchmark screening: probe each arriving pre-tokenized
    document's distinct token n-gram codes against a PRE-BUILT filter
    (built once from the benchmark with ``build_sketch`` over
    ``token_ngram_codes``) — the reference's contains_bulk flow on a
    stream. Stateless (each doc's verdict depends only on its own row +
    the static filter), so it runs in append mode with no state store, no
    watermark, and no per-key shuffle; one output row per doc with >= n
    tokens: (doc_id, n_ngrams, n_matched, contaminated). This is the
    online admission check of a training-data pipeline: screen incoming
    crawl shards against held-out benchmarks before they enter the
    corpus."""
    from ..functions.dedup import screen_token_ngrams

    return screen_token_ngrams(stream_df, sketch, n, tokens_col, id_col)


def stream_interval_join(left_stream: DataFrame, right_stream: DataFrame,
                         on: str, left_ts: str, right_ts: str,
                         lookback: str = "1 hour",
                         watermark: str = "10 minutes") -> DataFrame:
    """STREAM-STREAM attribution-candidate join: every left event paired
    with all right events of the same key inside its lookback window
    (left_ts - lookback < right_ts <= left_ts) — the streaming prefix of
    an as-of join (pick-the-latest is a per-left-row aggregation a
    downstream batch step or foreachBatch applies; a pure append stream
    cannot emit "the latest so far" without retracting it later, so the
    candidate set IS the correct streaming contract).

    Uses Spark's native watermarked stream-stream inner join: BOTH sides
    carry the event-time watermark and the join condition bounds
    right_ts relative to left_ts, which is exactly what lets Spark evict
    buffered rows older than watermark + lookback — state stays bounded
    by (rate x (lookback + watermark)), the canonical pattern. Output
    columns: (key, left/right event-time columns aliased apart, and each
    side's payload struct)."""
    lcols = [c for c in left_stream.columns if c not in (on, left_ts)]
    rcols = [c for c in right_stream.columns if c not in (on, right_ts)]
    l = (left_stream
         .withColumn(left_ts, F.col(left_ts).cast("timestamp"))
         .withWatermark(left_ts, watermark)
         .select(F.col(on).alias("_k"), F.col(left_ts).alias("_lts"),
                 F.struct(*lcols).alias("left_row")))
    r = (right_stream
         .withColumn(right_ts, F.col(right_ts).cast("timestamp"))
         .withWatermark(right_ts, watermark)
         .select(F.col(on).alias("_rk"), F.col(right_ts).alias("_rts"),
                 F.struct(*rcols).alias("right_row")))
    cond = ((F.col("_k") == F.col("_rk"))
            & (F.col("_rts") <= F.col("_lts"))
            & (F.col("_rts") > F.col("_lts") - F.expr(f"INTERVAL {lookback}")))
    return (l.join(r, cond)
            .select(F.col("_k").alias(on), F.col("_lts").alias("left_ts"),
                    F.col("_rts").alias("right_ts"), "left_row", "right_row"))


# -- streaming table profiles -------------------------------------------------
# The one-scan profiler's mergeable form (operators/profile.py
# ``with_sketch=True``) applied to unbounded input: per micro-batch, profile
# the batch and merge counts + per-column HLLs into a running profile — the
# data-quality monitor of an ingest stream (null-rate spikes, cardinality
# drift) with the same durable-snapshot/replay-skip recipe as
# ``sketch_stream_query``.

_PROFILES: dict[str, dict] = {}
# foreachBatch runs on a streaming thread while get_stream_profile is
# polled from the driver thread (the live-monitoring mode): guard every
# read/mutation of _PROFILES so a poll never sees a half-applied batch
# (n_rows updated, n_nulls not) or a dict mutated mid-iteration
import threading as _threading

_PROFILE_LOCK = _threading.Lock()


def get_stream_profile(name: str) -> dict | None:
    """{column: {"n_rows", "n_nulls", "ndv_est"[, numeric stats]}} of the
    running profile — a consistent snapshot (never reflects a
    partially-folded batch). Numeric columns additionally carry
    "min"/"max" and, for integral ones, exact "sum"/"sumsq" ints."""
    with _PROFILE_LOCK:
        prof = _PROFILES.get(name)
        if prof is None:
            return None
        out = {}
        for c, v in prof.items():
            d = {"n_rows": v[0], "n_nulls": v[1],
                 # NaN for not-estimable (map-typed) columns, matching the
                 # batch profiler's surface exactly
                 "ndv_est": float(v[2].estimate()) if v[2] is not None
                 else float("nan")}
            st = v[3] if len(v) > 3 else None
            if st is not None:
                d["min"], d["max"] = st[1], st[2]
                if st[0] == "i":
                    d["sum"], d["sumsq"] = st[3], st[4]
            out[c] = d
        return out


_PROFILE_BLOB_V2 = -2  # magic: v2 snapshots carry a per-column stats field


def _profile_blob(prof: dict) -> bytes:
    import json
    import struct

    out = [struct.pack("<qq", _PROFILE_BLOB_V2, len(prof))]
    for c, (n, nn, sk, st) in prof.items():
        cb = c.encode()
        pb = sk.to_bytes() if sk is not None else b""
        sb = json.dumps(st).encode() if st is not None else b""
        out.append(struct.pack("<qqqqq", len(cb), n, nn, len(pb), len(sb)))
        out.append(cb)
        out.append(pb)
        out.append(sb)
    return b"".join(out)


def _parse_profile_records(raw: bytes, off: int, n_cols: int,
                           five_fields: bool) -> dict:
    import json
    import struct

    prof = {}
    for _ in range(n_cols):
        if five_fields:
            lc, n, nn, lp, ls = struct.unpack_from("<qqqqq", raw, off)
            off += 40
        else:
            lc, n, nn, lp = struct.unpack_from("<qqqq", raw, off)
            ls = 0
            off += 32
        if not (0 < lc <= 4096) or lp < 0 or ls < 0 \
                or off + lc + lp + ls > len(raw):
            raise ValueError("implausible profile record")
        c = raw[off:off + lc].decode(); off += lc
        sk = sketch_from_bytes(raw[off:off + lp]) if lp else None
        off += lp
        st = json.loads(raw[off:off + ls].decode()) if ls else None
        off += ls
        prof[c] = [n, nn, sk, st]
    if off != len(raw):
        raise ValueError("trailing bytes in profile snapshot")
    return prof


def _profile_from_blob(raw: bytes) -> dict:
    import struct

    (head,) = struct.unpack_from("<q", raw, 0)
    if head == _PROFILE_BLOB_V2:
        (n_cols,) = struct.unpack_from("<q", raw, 8)
        return _parse_profile_records(raw, 16, n_cols, True)
    # Headerless (pre-v2) snapshots are refused outright rather than
    # sniffed: two headerless layouts once existed and disambiguating by
    # try-parsing could, on a length coincidence, silently load a
    # corrupted profile. Those snapshots only ever lived in short-lived
    # tmp checkpoints, so there is no migration path to keep — delete the
    # profile_*.bin snapshot files and re-run; the stream re-folds from
    # its own checkpointed source replay.
    raise ValueError(
        "unrecognized profile snapshot format (pre-v2 headerless snapshot "
        "or corrupt blob): delete the profile_*.bin files next to the "
        "checkpoint and restart the query to rebuild the profile")


def stream_profile_rows(spark, name: str) -> DataFrame:
    """The running stream profile as a DataFrame in the exact
    ``profile_table`` schema (column, n_rows, n_nulls, ndv_est, min_long,
    max_long, min_double, max_double, sum_str, sumsq_str) — the rows a
    batch profile over everything folded so far would produce (counts
    add, HLL merges are deterministic, min/max and exact integer sums
    merge bit-exactly). Raises KeyError for an unknown profile name."""
    from ..operators.profile import _PROFILE_SCHEMA, _agg_to_rows

    with _PROFILE_LOCK:
        prof = _PROFILES.get(name)
        rows = None if prof is None else _agg_to_rows(
            {c: tuple(v) for c, v in prof.items()}, False)
    if rows is None:
        raise KeyError(f"no stream profile named {name!r}")
    return spark.createDataFrame(rows, _PROFILE_SCHEMA)


def profile_stream_query(
    stream_df: DataFrame,
    name: str,
    checkpoint_dir: str,
    columns: list[str] | None = None,
    hll_p: int = 14,
    trigger_available_now: bool = True,
):
    """Maintain a running mergeable table profile over a stream (readable
    via ``get_stream_profile(name)``): every micro-batch is profiled with
    the one-scan profiler and folded in — counts add, HLLs merge, so the
    running profile equals a batch ``profile_table`` over everything seen.
    Snapshot-per-batch next to the checkpoint; a driver restart reloads the
    newest snapshot and skips replayed batches (exactly-once)."""
    _claim(name, "profile")
    # the replay-skip watermark lives in the shared _PERSISTED_BATCH dict;
    # namespace the key so even a kind-registry bypass can't collide with a
    # sketch/dedup query of the same name
    wkey = f"profile:{name}"
    d = _state_dir(checkpoint_dir)
    with _PROFILE_LOCK:
        _PROFILES.pop(name, None)
    best, path = -1, None
    try:
        for f in os.listdir(d):
            if f.startswith("profile_") and f.endswith(".bin"):
                bid = int(f[8:-4])
                if bid > best:
                    best, path = bid, os.path.join(d, f)
    except FileNotFoundError:
        pass
    _PERSISTED_BATCH[wkey] = best
    if path is not None:
        with open(path, "rb") as fh:
            loaded = _profile_from_blob(fh.read())
        with _PROFILE_LOCK:
            _PROFILES[name] = loaded

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # profile_agg returns the driver accumulator dict directly — no
        # DataFrame round trip, no extra sketch (de)serialization on the
        # per-batch hot path
        from ..operators.profile import profile_agg

        if batch_id <= _PERSISTED_BATCH.get(wkey, -1):
            return
        if batch_df.isEmpty():
            return
        batch_agg = profile_agg(batch_df, columns=columns, hll_p=hll_p)
        with _PROFILE_LOCK:
            from ..operators.profile import merge_stats

            prof = _PROFILES.setdefault(name, {})
            for c, (n, nn, sk, st) in batch_agg.items():
                slot = prof.setdefault(c, [0, 0, None, None])
                slot[0] += n
                slot[1] += nn
                if sk is not None:
                    slot[2] = sk if slot[2] is None else slot[2].merge(sk)
                slot[3] = merge_stats(slot[3], st)
            blob = _profile_blob(prof)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".profile_{batch_id}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(d, f"profile_{batch_id:012d}.bin"))
        for f in sorted(x for x in os.listdir(d)
                        if x.startswith("profile_") and x.endswith(".bin"))[:-2]:
            try:
                os.remove(os.path.join(d, f))
            except OSError:
                pass
        _PERSISTED_BATCH[wkey] = batch_id

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -- streaming deterministic uniform sample -----------------------------------
# Bottom-k by md5(key) priority is a MERGEABLE sample: bottom-k of a union
# equals bottom-k of the per-part bottom-ks, so the held sample after any
# micro-batch sequence is byte-identical to the batch ``uniform_sample``
# over everything seen — regardless of batch boundaries, arrival order, or
# restarts. State is k rows (an Arrow table snapshotted per batch).

import io

import pyarrow as pa
import pyarrow.compute as pc

_SAMPLE_LOCK = _threading.Lock()
_SAMPLE_TABLES: dict[str, "pa.Table"] = {}


def get_stream_sample(name: str):
    """The running bottom-k sample as a pyarrow Table (priority column
    ``_pri`` first, then the stream's columns), or None."""
    with _SAMPLE_LOCK:
        return _SAMPLE_TABLES.get(name)


def stream_sample_rows(spark, name: str) -> DataFrame:
    """The running sample as a DataFrame in the stream's schema (the rows
    batch ``uniform_sample(k)`` over everything folded so far would
    return). Raises KeyError for an unknown sample name."""
    with _SAMPLE_LOCK:
        t = _SAMPLE_TABLES.get(name)
    if t is None:
        raise KeyError(f"no stream sample named {name!r}")
    return spark.createDataFrame(t.to_pandas().drop(columns=["_pri"]))


def _sample_blob(t) -> bytes:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue()


def _sample_from_blob(raw: bytes):
    return pa.ipc.open_stream(raw).read_all()


def sample_stream_query(
    stream_df: DataFrame,
    key_col: str,
    k: int,
    name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Maintain a deterministic k-row uniform sample over a stream
    (readable via ``stream_sample_rows``): each micro-batch contributes
    its own bottom-k by md5(key) — a TakeOrderedAndProject, never a
    batch-wide sort — and the driver keeps the k smallest priorities of
    the union. Equal input => equal sample as the batch
    ``operators.sampling.uniform_sample``, which is what the parity gate
    asserts. Snapshot-per-batch next to the checkpoint (Arrow IPC, k
    rows); restarts reload the newest snapshot and skip replayed batches
    (exactly-once)."""
    _claim(name, "sample")
    wkey = f"sample:{name}"
    d = _state_dir(checkpoint_dir)
    with _SAMPLE_LOCK:
        _SAMPLE_TABLES.pop(name, None)
    best, path = -1, None
    try:
        for f in os.listdir(d):
            if f.startswith("sample_") and f.endswith(".bin"):
                bid = int(f[7:-4])
                if bid > best:
                    best, path = bid, os.path.join(d, f)
    except FileNotFoundError:
        pass
    _PERSISTED_BATCH[wkey] = best
    if path is not None:
        with open(path, "rb") as fh:
            loaded = _sample_from_blob(fh.read())
        with _SAMPLE_LOCK:
            _SAMPLE_TABLES[name] = loaded

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _PERSISTED_BATCH.get(wkey, -1):
            return
        if batch_df.isEmpty():
            return
        part = (batch_df
                .withColumn("_pri", F.md5(F.col(key_col).cast("string")))
                .select("_pri", *batch_df.columns)
                .orderBy("_pri").limit(k))
        batch_top = pa.Table.from_pandas(part.toPandas(),
                                         preserve_index=False)
        with _SAMPLE_LOCK:
            cur = _SAMPLE_TABLES.get(name)
            merged = (batch_top if cur is None
                      else pa.concat_tables([cur, batch_top],
                                            promote_options="none"))
            order = pc.sort_indices(merged,
                                    sort_keys=[("_pri", "ascending")])
            merged = merged.take(order[:k])
            _SAMPLE_TABLES[name] = merged
            blob = _sample_blob(merged)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".sample_{batch_id}.tmp")
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, os.path.join(d, f"sample_{batch_id:012d}.bin"))
        for f in sorted(x for x in os.listdir(d)
                        if x.startswith("sample_") and x.endswith(".bin"))[:-2]:
            try:
                os.remove(os.path.join(d, f))
            except OSError:
                pass
        _PERSISTED_BATCH[wkey] = batch_id

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
