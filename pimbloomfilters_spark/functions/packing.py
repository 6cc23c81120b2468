"""Sequence packing: assign pre-tokenized documents to fixed-length context
windows — the step between a deduplicated corpus and a training dataloader.

Contract (the standard concat-and-split used by LLM pretraining pipelines):
within each group (``by``, default ``source``), documents are concatenated in
``order_col`` order into one token stream, which is then cut every
``ctx_len`` tokens. Each document therefore occupies a contiguous token span
``[start_off, start_off + n_tok)`` of its group's stream and overlaps windows
``first_win .. last_win``. The assignment is fully deterministic and
relational — no UDF anywhere, every column integer math inside whole-stage
codegen.

Scale shape: ONE shuffle, by the group key (the window function's
partitioning). Each group sorts locally by ``order_col`` — a sort Spark
spills if needed. A pathologically large single group serializes into one
task; the standard fix is a finer group key (e.g. source x date-shard) chosen
so groups fit a task, which also matches how training shards are actually
laid out. Cross-group window ids are independent by construction, so groups
never synchronize.

Integer-exactness: offsets use Spark's integral ``div``/DuckDB's ``//``, not
double division — window ids stay exact past 2^53 tokens per group (a 100 TB
corpus in one group is ~2.5e13 tokens; doubles would still be exact there,
but the integral path removes the cliff entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pack_context_windows(df: DataFrame, ctx_len: int,
                         n_tok_col: str = "n_tok",
                         order_col: str = "doc_id",
                         by: str = "source") -> DataFrame:
    """Per-document window assignment: (order_col, by, n_tok, start_off,
    first_win, last_win, n_windows). ``n_windows`` is the number of
    ctx_len-token windows this document's span overlaps (documents crossing
    a window boundary count toward every window they touch; a zero-token
    document occupies no window)."""
    L = int(ctx_len)
    if L <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    w = Window.partitionBy(by).orderBy(order_col)
    out = (
        df.select(order_col, by, F.col(n_tok_col).alias("n_tok"))
        .withColumn("start_off",
                    (F.sum("n_tok").over(w) - F.col("n_tok")).cast("long"))
        .withColumn("first_win", F.expr(f"start_off div {L}"))
        .withColumn("last_win", F.expr(f"(start_off + n_tok - 1) div {L}"))
    )
    return out.select(
        order_col, by, "n_tok", "start_off",
        F.when(F.col("n_tok") > 0, F.col("first_win")).alias("first_win"),
        F.when(F.col("n_tok") > 0, F.col("last_win")).alias("last_win"),
        F.when(F.col("n_tok") > 0,
               (F.col("last_win") - F.col("first_win") + 1).cast("int"))
         .otherwise(F.lit(0)).alias("n_windows"),
    )


def _bfd_assign(sizes: list, ctx_len: int) -> list:
    """Bin id per size for an already-sorted (desc) fitting-size sequence —
    the sequential greedy at the heart of ``pack_bins_best_fit``, kept as a
    module function so property tests drive the REAL placement code. Best
    fit = smallest adequate residual (bisect over the sorted residual list,
    O(log bins) search per doc); deterministic for a given input order."""
    import bisect

    residuals: list[int] = []   # sorted ascending
    res_bins: list[int] = []    # bin id aligned with residuals
    next_bin = 0
    assigned = []
    for s in sizes:
        i = bisect.bisect_left(residuals, s)
        if i == len(residuals):  # nothing fits: open a bin
            assigned.append(next_bin)
            bisect.insort(residuals, ctx_len - s)
            # insort on equal keys places AFTER existing ones; keep the
            # aligned bin list consistent by re-deriving the index
            j = bisect.bisect_right(residuals, ctx_len - s) - 1
            res_bins.insert(j, next_bin)
            next_bin += 1
        else:
            b, r = res_bins.pop(i), residuals.pop(i) - s
            assigned.append(b)
            j = bisect.bisect_left(residuals, r)
            residuals.insert(j, r)
            res_bins.insert(j, b)
    return assigned


def pack_bins_best_fit(df: DataFrame, ctx_len: int,
                       n_tok_col: str = "n_tok",
                       id_col: str = "doc_id",
                       by: str = "source",
                       shards: int = 1) -> DataFrame:
    """(id_col, by, n_tok, bin_id): best-fit-decreasing bin packing WITHIN
    each group — the no-boundary-crossing alternative to concat-and-split:
    every bin holds whole documents totalling <= ctx_len tokens, so
    attention never spans documents and no token is truncated. Documents
    with n_tok > ctx_len are dropped (they cannot fit any bin; count them
    upstream with a filter). Deterministic: docs are placed in
    (n_tok desc, id asc) order, each into the fullest bin that still fits
    (ties broken by the residual list's insertion order, itself
    deterministic), so output is reproducible run to run.

    Guarantees (classic any-fit analysis): every bin fits ctx_len by
    construction, and at most ONE bin is <= half full — two such bins can't
    coexist because the later one's first document would have fit the
    earlier — so n_bins <= ceil(2*total/ctx_len) + 1 regardless of input
    (BFD's asymptotic bound is the far tighter 11/9 OPT). The gate checks
    both invariants.

    Scale shape: one shuffle on the group key; packing is inherently
    sequential per group (a greedy with state), so each group is one task.
    ``shards`` is the sizing knob for a pathologically huge group: docs
    hash into ``shards`` sub-groups packed independently in parallel
    ((group, shard) is the task key), and local bin ids are striped as
    ``local * shards + shard`` so bins stay unique per group and the
    output schema is unchanged. Cost of the parallelism: the "<= one
    half-empty bin" guarantee and the any-fit bound now hold PER SHARD
    (so per group: <= ``shards`` half-empty bins, n_bins <=
    ceil(2*total/ctx_len) + shards); per-bin capacity and whole-doc
    placement are unaffected. Within a task the placement loop is
    O(docs x log bins) via a bisect over sorted residual capacities."""
    L = int(ctx_len)
    if L <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")
    n_shards = int(shards)
    if n_shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    def _pack(pdf):
        import pandas as pd

        shard = int(pdf["_sh"].iloc[0]) if n_shards > 1 else 0
        pdf = pdf[pdf["n_tok"] <= L].sort_values(
            ["n_tok", id_col], ascending=[False, True])
        out = pdf[[id_col, by, "n_tok"]].copy()
        local = _bfd_assign(pdf["n_tok"].to_list(), L)
        out["bin_id"] = pd.array([b * n_shards + shard for b in local],
                                 dtype="int64")
        return out

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, {by} string, n_tok int, bin_id long"
    src = df.select(id_col, by, F.col(n_tok_col).cast("int").alias("n_tok"))
    if n_shards == 1:
        return src.groupBy(by).applyInPandas(_pack, schema)
    sharded = src.withColumn(
        "_sh", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int"))
    return sharded.groupBy(by, "_sh").applyInPandas(_pack, schema)


def packing_stats(df: DataFrame, ctx_len: int,
                  n_tok_col: str = "n_tok",
                  order_col: str = "doc_id",
                  by: str = "source") -> DataFrame:
    """Per-group packing summary: (by, n_docs, total_tok, n_windows,
    tail_padding, boundary_docs). ``n_windows`` counts ctx_len windows the
    group's stream fills (last one padded by ``tail_padding`` tokens);
    ``boundary_docs`` counts documents split across a window boundary — the
    quantity attention-mask / best-fit packing schemes try to minimize."""
    L = int(ctx_len)
    p = pack_context_windows(df, L, n_tok_col, order_col, by)
    return (
        p.groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tok"),
            F.sum(F.when(F.col("n_windows") > 1, 1).otherwise(0))
             .cast("long").alias("boundary_docs"),
        )
        .withColumn("n_windows", F.expr(f"(total_tok + {L} - 1) div {L}"))
        .withColumn("tail_padding",
                    (F.col("n_windows") * L - F.col("total_tok")).cast("long"))
        .select(by, "n_docs", "total_tok", "n_windows", "tail_padding",
                "boundary_docs")
    )


def length_buckets(df: DataFrame, n_buckets: int,
                   n_tok_col: str = "n_tok",
                   id_col: str = "doc_id",
                   split_threshold: int = 2_000_000) -> DataFrame:
    """Adds ``bucket`` (1-based): equal-size sequence-LENGTH buckets in
    (n_tok, id) order — the length-bucketed batching stage of a training
    pipeline (group similar-length sequences so per-batch padding waste is
    minimal; the window/bin packers here then pack within a bucket).
    Semantics are exactly SQL ``ntile(n) OVER (ORDER BY n_tok, id)``: the
    first ``total % n`` buckets hold ``ceil(total/n)`` rows, the rest
    ``floor(total/n)`` — deterministic, engine-portable, and stable
    under any partitioning.

    Scale shape: the global rank comes from the same no-single-task-window
    construction as ``epoch_shuffle``/``vocab_table`` — rows bucket by
    their OWN length value (trivially monotone in the sort key), each
    length group is window-ranked in parallel (ties by id), and the
    exclusive prefix sum of per-length counts (one tiny aggregate over
    distinct lengths — bounded by the context-length ceiling, collected
    and broadcast) lifts local ranks to global. ntile() itself would plan
    a SinglePartition exchange at any corpus size. Reference analogue:
    none (SURVEY §2.4 — the reference has no corpus ops).

    Hot-length de-skew (round-6 verdict #3): a post-truncation corpus can
    put most rows at ONE length, which would rank that length in a single
    window task. Lengths with more than ``split_threshold`` rows (and an
    integral id column) are therefore sub-split into equal id-RANGE
    sub-groups — monotone in the (length, id) sort order, so the global
    rank stays EXACT: rank = length offset + sub-range offset (from one
    extra aggregate over only the hot lengths) + in-sub-range rank. The
    default threshold keeps a window-sort task under ~2M rows; non-integral
    id columns fall back to one window per length (skew bound = largest
    length group — document or pre-map ids when that matters).

    Determinism contract (shared with ``epoch_shuffle``): the input must be
    deterministic — counts/ranges are collected in one job and the plan
    re-evaluates for ranking; persist nondeterministic inputs first."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if split_threshold < 1:
        raise ValueError("split_threshold must be >= 1")
    spark = df.sparkSession
    # NULL lengths are dropped (ntile over a NULL sort key would order them
    # engine-specifically; and the Python offset sort below cannot compare
    # None) — same explicit-NULL policy as epoch_shuffle.
    df = df.filter(F.col(n_tok_col).isNotNull())
    id_integral = dict(df.dtypes)[id_col] in (
        "tinyint", "smallint", "int", "bigint")
    sizes = sorted(
        (r["_l"], r["cnt"], r["_mn"], r["_mx"]) for r in
        df.select(F.col(n_tok_col).alias("_l"), F.col(id_col).alias("_id"))
        .groupBy("_l").agg(
            F.count("*").alias("cnt"),
            (F.min("_id") if id_integral else F.lit(None)).alias("_mn"),
            (F.max("_id") if id_integral else F.lit(None)).alias("_mx"),
        ).collect())
    total = sum(cnt for _, cnt, _, _ in sizes)
    if total == 0:
        return df.withColumn("bucket", F.lit(None).cast("int"))
    hot = {length: (int(mn), int(mx), cnt)
           for length, cnt, mn, mx in sizes
           if id_integral and cnt > split_threshold and mx > mn}
    if hot:
        # per hot length: equal id-range sub-groups (monotone in id), with
        # EXACT per-(length, sub) counts from one aggregate over only the
        # hot lengths; cold lengths keep sub = 0
        meta = [(length, mn,
                 -(-(mx - mn + 1) // min(-(-cnt // split_threshold), 65536)))
                for length, (mn, mx, cnt) in hot.items()]
        mdf = F.broadcast(spark.createDataFrame(
            meta, "_l long, _hmn long, _step long"))
        sub_expr = F.coalesce(
            F.expr(f"(CAST({id_col} AS BIGINT) - _hmn) div _step"), F.lit(0))
        keyed = (df.withColumn("_l", F.col(n_tok_col).cast("long"))
                 .join(mdf, "_l", "left")
                 .withColumn("_sub", sub_expr))
        sub_sizes = {
            (r["_l"], r["_s"]): r["cnt"] for r in
            keyed.filter(F.col("_hmn").isNotNull())
            .groupBy(F.col("_l"), F.col("_sub").alias("_s"))
            .agg(F.count("*").alias("cnt")).collect()}
        offsets, acc = [], 0
        for length, cnt, _, _ in sizes:
            if length in hot:
                for (hl, s), c in sorted(
                        kv for kv in sub_sizes.items() if kv[0][0] == length):
                    offsets.append((hl, int(s), acc))
                    acc += c
            else:
                offsets.append((length, 0, acc))
                acc += cnt
        off = F.broadcast(spark.createDataFrame(
            offsets, "_l long, _sub long, _off long"))
        base = keyed.drop("_hmn", "_step")
        local = F.row_number().over(
            Window.partitionBy(n_tok_col, "_sub").orderBy(id_col))
        join_keys = ["_l", "_sub"]
    else:
        offsets, acc = [], 0
        for length, cnt, _, _ in sizes:
            offsets.append((length, acc))
            acc += cnt
        off = F.broadcast(spark.createDataFrame(offsets, "_l long, _off long"))
        base = df.withColumn("_l", F.col(n_tok_col).cast("long"))
        local = F.row_number().over(
            Window.partitionBy(n_tok_col).orderBy(id_col))
        join_keys = ["_l"]
    # exact ntile arithmetic (integer div only) from the 1-based global rank
    small = max(total // n_buckets, 1)    # rows per tail bucket
    big = total // n_buckets + 1          # rows in each of the first `rem`
    rem = total % n_buckets               # buckets (they hold one extra row)
    cut = rem * big
    bucket = F.expr(
        f"CAST(IF(_rank <= {cut}, (_rank - 1) div {big},"
        f" {rem} + (_rank - 1 - {cut}) div {small}) + 1 AS INT)")
    return (base.join(off, join_keys)
            .withColumn("_rank", (F.col("_off") + local).cast("long"))
            .withColumn("bucket", bucket)
            .drop("_l", "_sub", "_off", "_rank"))
