"""Structured Streaming sketch maintenance.

The reference is strictly batch (SURVEY.md §2.4: no streaming state); these
operators extend the same mergeable-sketch algebra to unbounded input — the
property that makes a sketch *streamable* is exactly the one that makes it
partition-parallel: associative, commutative merge.

Two shapes:

1. ``sketch_stream_query`` — foreachBatch: every micro-batch builds partial
   sketches with the batch engine (same mapInArrow path) and merges them into
   a driver-held running sketch. Works with ANY sink discipline and any
   sketch kind; the running sketch is exactly-once per micro-batch under
   Structured Streaming's replay because merge is idempotent for Bloom/HLL
   (bitwise-OR / max) — CMS/KLL replays are at-least-once (documented).

2. ``windowed_distinct_stream`` — applyInPandasWithState: per event-time
   window, an HLL is kept as GroupState bytes and re-emitted with the running
   distinct estimate each batch; watermark-driven eviction closes windows.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.build import build_partials, merge_partial_rows
from ..sketches import Sketch, sketch_from_bytes

# driver-side registry of running sketches, keyed by query name
_RUNNING: dict[str, Sketch] = {}


def get_stream_sketch(name: str) -> Sketch | None:
    return _RUNNING.get(name)


def sketch_stream_query(
    stream_df: DataFrame,
    col: str,
    make: Callable[[], Sketch],
    name: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Start a streaming query that folds every micro-batch into a running
    sketch (driver-held, readable via ``get_stream_sketch(name)``)."""
    _RUNNING.pop(name, None)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial, _ = merge_partial_rows(build_partials(batch_df, col, make).collect())
        cur = _RUNNING.get(name)
        _RUNNING[name] = partial if cur is None else cur.merge(partial)

    writer = (
        stream_df.writeStream.foreachBatch(_fold)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_stream_query(
    stream_df: DataFrame,
    key_col: str,
    out_path: str,
    checkpoint_dir: str,
    size2: int = 26,
    nb_hash: int = 8,
    name: str = "bloom_dedup",
):
    """Streaming drop-already-seen filter: every micro-batch is probed against
    a running Bloom filter of all keys seen so far; unseen rows are appended
    to ``out_path`` and their keys inserted. First occurrences always pass
    (no false negatives => nothing is wrongly treated as seen... the
    guarantee is the reverse of exact dedup's: a false POSITIVE drops a
    first occurrence with probability = FPR, the standard approximate-dedup
    trade — size the filter for the expected key cardinality).
    """
    import functools as _ft

    from ..operators.build import build_partials, merge_partial_rows
    from ..operators.probe import probe_key_column
    from ..sketches import make_sketch

    _RUNNING.pop(name, None)
    factory = _ft.partial(make_sketch, "bloom", size2=size2, nb_hash=nb_hash)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seen = _RUNNING.get(name)
        if seen is None:
            fresh = batch_df
        else:
            fresh = probe_key_column(batch_df, seen, key_col).filter(
                ~F.col("member")
            ).drop("member")
        # exact within-batch dedup (the filter only learns keys after the
        # whole batch); cross-batch dedup is the Bloom's job
        fresh = fresh.dropDuplicates([key_col]).persist()
        fresh.write.mode("append").parquet(out_path)
        partial, _ = merge_partial_rows(
            build_partials(fresh, key_col, factory).collect()
        )
        _RUNNING[name] = partial if seen is None else seen.merge(partial)
        fresh.unpersist()

    return (
        stream_df.writeStream.foreachBatch(_step)
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


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
    hll_p: int = 12,
) -> DataFrame:
    """Per-event-time-window streaming distinct-count (HLL) via
    applyInPandasWithState. Late data beyond the watermark is dropped by
    Spark; window state is evicted on event-time timeout."""
    from ..sketches import HyperLogLog

    with_window = (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_w", F.window(F.col(ts_col), window).getField("start"))
        .withColumn("_k", F.xxhash64(F.col(key_col).cast("string")))
        .select("_w", "_k")
    )

    def _update(key, pdfs, state: GroupState):
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
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
