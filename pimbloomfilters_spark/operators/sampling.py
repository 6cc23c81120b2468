"""Deterministic sampling for training-data pipelines.

Bottom-k / priority sampling: assign every row the priority ``md5(key)`` and
keep the k smallest. This is a uniform-without-replacement sample that is

- deterministic (same input -> same sample, any partitioning/cluster size),
- mergeable (bottom-k of a union = bottom-k of the per-partition bottom-ks —
  the same partial+final shape as every sketch here), and
- oracle-exact: md5 hex is identical in Spark and DuckDB, so the gate can
  reproduce the sample byte-for-byte (a seeded RNG sample could not be).

Spark executes this as a TakeOrderedAndProject (per-partition top-k heap +
driver k-way merge) — no global sort, shuffle is O(partitions x k).

``stratified_sample_exact`` keeps k per stratum via a window rank — the
per-source variant a skewed corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _priority(key_col: str):
    return F.md5(F.col(key_col).cast("string"))


def uniform_sample(df: DataFrame, k: int, key_col: str) -> DataFrame:
    """k-row uniform sample, deterministic by md5(key) priority."""
    return (
        df.withColumn("_pri", _priority(key_col))
        .orderBy("_pri")
        .limit(k)
        .drop("_pri")
    )


def stratified_sample(df: DataFrame, k_per_stratum: int, key_col: str,
                      stratum_col: str) -> DataFrame:
    """k rows per stratum (e.g. per source), same deterministic priority."""
    w = Window.partitionBy(stratum_col).orderBy(_priority(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_per_stratum)
        .drop("_rn")
    )


def weighted_sample(df: DataFrame, k: int, key_col: str,
                    weight_col) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    keep the k rows with the largest ln(u)/w, u a deterministic uniform in
    (0, 1] derived from md5(key). Inclusion probability grows with weight;
    taking the top-k by u^(1/w) (equivalently ln(u)/w — exp is monotone) is
    the published exponential-race construction.

    Determinism across engines: u uses exactly 13 hex digits of the md5
    (52 bits < 2^53), so the integer, the division by 2^52 (a power of two),
    ln(), and the divide by the integer weight are all bit-exact doubles in
    both Spark and DuckDB — the oracle reproduces the sample byte-for-byte.
    Plan shape: TakeOrderedAndProject, same as ``uniform_sample``."""
    w = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    u = (
        F.conv(F.substring(_priority(key_col), 1, 13), 16, 10).cast("double")
        / F.lit(float(1 << 52))
    )
    return (
        df.withColumn("_pri", F.log(u) / w)
        .orderBy(F.desc("_pri"), F.asc(key_col))
        .limit(k)
        .drop("_pri")
    )


def hash_split(df: DataFrame, fractions: dict, key_col: str,
               salt: str = "", split_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split — the dataset-versioning stage of
    a training pipeline: every row lands in the split whose cumulative
    fraction interval contains u = md5(key || salt)[:13 hex] / 2^52, a
    52-bit uniform in [0, 1).

    Properties a seeded ``randomSplit`` cannot give:

    - row-stable: a row's split depends only on (key, salt) — reruns,
      repartitioning, cluster size, and corpus growth never move a row
      across splits (new rows join splits at the right rate);
    - leak-proof under dedup: equal keys always land in the same split;
    - engine-exact: the DuckDB oracle reproduces the assignment
      byte-for-byte (same 52-bit construction as ``weighted_sample``).

    Zero shuffles: the assignment is a row-local projection, so the split
    column composes with any downstream plan without an exchange.
    ``fractions`` maps split name -> fraction; they must sum to 1 (the
    last split absorbs the remainder interval, so float rounding in the
    cumulative bounds never drops a row). Insertion order of ``fractions``
    fixes the interval order."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f <= 0 for f in fractions.values()):
        raise ValueError("every fraction must be > 0")
    names = list(fractions)
    u = (
        F.conv(F.substring(
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
            1, 13), 16, 10).cast("double")
        / F.lit(float(1 << 52))
    )
    cum = 0.0
    expr = F.lit(names[-1])
    cases = []
    for name in names[:-1]:
        cum += fractions[name]
        cases.append((cum, name))
    for bound, name in reversed(cases):
        expr = F.when(u < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def epoch_shuffle(df: DataFrame, key_col: str, seed: int = 0,
                  n_shards: int = 8, n_buckets: int = 4096) -> DataFrame:
    """Deterministic global training order — the epoch-shuffle stage of a
    training-data pipeline: every row gets a global position in the order
    ``md5(seed || '|' || key)`` (ties broken by key, so positions are
    unique), a round-robin ``shard = pos % n_shards`` (shard sizes balanced
    to ±1 by construction), and ``pos_in_shard = pos / n_shards`` (the read
    offset within the shard file). Varying ``seed`` re-shuffles per epoch;
    the order is reproducible on any cluster size or partitioning, and the
    DuckDB oracle reproduces it byte-for-byte (md5 hex is engine-portable;
    a seeded RNG sort could not be).

    Adds columns: shard int, pos long, pos_in_shard long.

    Scale shape: global rank WITHOUT a single-task window and WITHOUT
    data-dependent partitioning — the same construction as the vocabulary
    ranker (``sources.tables.vocab_table``): rows bucket by a hex PREFIX
    of the md5 (a pure, deterministic function of the row, monotone under
    the hash ordering — ``repartitionByRange``'s re-sampled bounds would
    NOT be stable across evaluations), each bucket is window-ranked in
    parallel, and the exclusive prefix sum of the bucket counts (one tiny
    aggregate, broadcast back) lifts local ranks to global positions.
    ``n_buckets`` (a power of 16: 16 / 256 / 4096 / 65536, i.e. the hex
    prefix width; default 4096) is the parallelism dial: md5 uniformity
    bounds per-bucket rows at ~n/n_buckets ± noise, so at 10^12 rows the
    default keeps each window-sort task at ~2.4e8 rows instead of the
    fixed-256 shape's 4e9-row straggler (round-6 verdict #2); positions
    are bucket-count-INVARIANT by construction (pos = global (hash, key)
    rank), so the dial never changes results. One exchange
    (hash-partition by bucket) + one count aggregate.

    Determinism contract: the INPUT must be deterministic (no fresh
    rand()/uuid()/current-time columns) — bucket counts are collected in
    one job and the plan re-evaluates for ranking; a nondeterministic
    input can disagree between the two evaluations and corrupt positions.
    Same contract as the NULL/unique-key rules above; persist such inputs
    first."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if n_buckets not in (16, 256, 4096, 65536):
        raise ValueError("n_buckets must be one of 16, 256, 4096, 65536 "
                         "(a whole hex-prefix width)")
    prefix_w = {16: 1, 256: 2, 4096: 3, 65536: 4}[n_buckets]
    spark = df.sparkSession
    # NULL keys are dropped: they would all share one md5 (concat_ws skips
    # nulls), making their relative order — and therefore pos — depend on
    # partitioning. Keys should be UNIQUE for the same reason: equal keys
    # tie in (hash, key) and their pos assignment is arbitrary between them.
    df = df.filter(F.col(key_col).isNotNull())
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string")))
    # hex prefix -> integer: monotone in the hash's string order ('0'-'9'
    # sort before 'a'-'f' in ASCII and conv preserves that order)
    bkt = F.conv(F.substring("_h", 1, prefix_w), 16, 10) \
        .cast("long").alias("_bkt")
    base = df.withColumn("_h", h).withColumn("_bkt", bkt)
    sizes = sorted(
        (r["_bkt"], r["cnt"]) for r in
        base.groupBy("_bkt").agg(F.count("*").alias("cnt")).collect())
    offsets, acc = [], 0
    for b, cnt in sizes:
        offsets.append((b, acc))
        acc += cnt
    off = F.broadcast(spark.createDataFrame(offsets, "_bkt long, _off long"))
    local = F.row_number().over(
        Window.partitionBy("_bkt").orderBy("_h", key_col))
    return (
        base.join(off, "_bkt")
        .withColumn("pos", F.col("_off") + local - 1)
        .withColumn("shard", (F.col("pos") % n_shards).cast("int"))
        .withColumn("pos_in_shard", F.floor(F.col("pos") / n_shards))
        .drop("_h", "_bkt", "_off")
    )


def mixture_sample(df: DataFrame, quotas: dict, key_col: str,
                   stratum_col: str = "source") -> DataFrame:
    """Dataset mixing by DOC quota: keep the first ``quotas[stratum]`` rows
    of each stratum in deterministic md5-priority order (a per-stratum
    uniform sample with heterogeneous sizes — the "sample source A at 2x
    source B" knob of a training mixture). Strata absent from ``quotas``
    contribute nothing. Quotas ride a broadcast join; one shuffle for the
    per-stratum window."""
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(str(s), int(q)) for s, q in quotas.items()],
        f"{stratum_col} string, _quota long")
    w = Window.partitionBy(stratum_col).orderBy(_priority(key_col))
    return (
        df.join(F.broadcast(qdf), stratum_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def mixture_sample_tokens(df: DataFrame, budgets: dict, key_col: str,
                          n_tok_col: str = "n_tok",
                          stratum_col: str = "source") -> DataFrame:
    """Dataset mixing by TOKEN budget — how LLM mixtures are actually
    specified: within each stratum, walk rows in deterministic md5-priority
    order and keep a row iff the tokens already kept before it are under
    ``budgets[stratum]`` (so the budget-crossing row is included and every
    stratum reaches >= its budget when it has enough tokens; the overshoot
    is < one document). Deterministic and engine-exact: the order key is
    md5 of the row key, the running total integer — the DuckDB oracle
    reproduces the sample byte-for-byte. Same shapes as ``mixture_sample``:
    broadcast quota join + one per-stratum window."""
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(str(s), int(b)) for s, b in budgets.items()],
        f"{stratum_col} string, _budget long")
    w = Window.partitionBy(stratum_col).orderBy(_priority(key_col))
    return (
        df.join(F.broadcast(qdf), stratum_col)
        .withColumn("_before",
                    F.sum(n_tok_col).over(w) - F.col(n_tok_col))
        .filter(F.col("_before") < F.col("_budget"))
        .drop("_before", "_budget")
    )
