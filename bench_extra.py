"""Extra benchmarks for optimization work (guide §1.4): NOT part of the
driver contract — bench.py stays the frozen measurement surface.

Modes:
  python bench_extra.py --queries q1,q2,...   # isolate named catalog queries
  python bench_extra.py --all                 # every catalog query
  python bench_extra.py --explain q1,q2       # write plans/r07 explain files
  python bench_extra.py --core                # headline insert/lookup path

Per query we report: fn() construction time (driver-side eager work inside
the gate fn: collects, sketch builds) and the action time. The action is
``.count()`` to match bench.py's frozen methodology, plus a noop-sink run
(computes every column) for comparison.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PBF_BENCH_REPS", "2"))


def _spark():
    from pimbloomfilters_spark.session import get_spark

    return get_spark("pbf-bench-extra", cpus=CPUS,
                     shuffle_partitions=max(CPUS, 8))


def _warm(spark):
    import pyarrow  # noqa: F401
    from pyspark.sql import functions as F

    def _noop(batches):
        for b in batches:
            yield b

    (spark.range(0, CPUS * 4, numPartitions=CPUS * 4)
     .repartition(CPUS * 4, F.pmod("id", F.lit(97)))
     .mapInArrow(_noop, "id long").count())


def profile_queries(names: list[str], noop: bool = False) -> dict:
    from pimbloomfilters_spark.plans import CATALOG

    spark = _spark()
    _warm(spark)
    out = {}
    for name in names:
        spec = CATALOG[name]
        best = {"fn_s": float("inf"), "count_s": float("inf"),
                "noop_s": float("inf"), "total_s": float("inf")}
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"{name}: fn()")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}: count()")
            df.count()
            t2 = time.perf_counter()
            best["fn_s"] = min(best["fn_s"], t1 - t0)
            best["count_s"] = min(best["count_s"], t2 - t1)
            best["total_s"] = min(best["total_s"], t2 - t0)
            if noop:
                spark.sparkContext.setJobDescription(f"{name}: noop sink")
                t3 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best["noop_s"] = min(best["noop_s"],
                                     time.perf_counter() - t3)
            spark.sparkContext.setJobDescription(None)
        if not noop:
            best.pop("noop_s")
        out[name] = {k: round(v, 3) for k, v in best.items()}
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
    return out


def write_explains(names: list[str], suffix: str) -> None:
    from pimbloomfilters_spark.plans import CATALOG

    spark = _spark()
    os.makedirs(os.path.join(_REPO, "plans", "r07"), exist_ok=True)
    for name in names:
        df = CATALOG[name].fn(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(_REPO, "plans", "r07", f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


def profile_core() -> dict:
    """Headline sharded insert / lookup / fpr with phase breakdown."""
    import functools

    from pyspark.storagelevel import StorageLevel
    from pyspark.sql import functions as F

    from pimbloomfilters_spark.operators.probe import probe_count
    from pimbloomfilters_spark.operators.sharded import (
        assemble_bloom, build_bloom_shards, build_bloom_sharded)

    N_KEYS = int(os.environ.get("PBF_BENCH_KEYS", str(10_000_000)))
    SIZE2 = int(os.environ.get("PBF_BENCH_SIZE2", "27"))
    spark = _spark()
    _warm(spark)
    keys = spark.range(0, N_KEYS, numPartitions=CPUS * 2)
    keys.persist(StorageLevel.MEMORY_AND_DISK).count()
    n_shards = min(1 << (SIZE2 - 12), max(16, 1 << (CPUS.bit_length() + 1)))
    out = {}

    def best(label, fn):
        b, r = float("inf"), None
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            r = fn()
            b = min(b, time.perf_counter() - t0)
        out[label] = round(b, 3)
        print(json.dumps({label: out[label]}), file=sys.stderr, flush=True)
        return r

    # phase 1: the shard build WITHOUT the collect (noop-style count)
    shards_df = build_bloom_shards(keys, "id", size2=SIZE2, nb_hash=8,
                                   n_shards=n_shards)
    best("shards_compute_only", lambda: shards_df.count())
    # phase 2: collect
    rows = best("shards_collect", lambda: shards_df.collect())
    # phase 3: assemble
    best("assemble", lambda: assemble_bloom(
        rows, SIZE2, 8, n_shards=n_shards))
    # full path (the bench metric)
    sk = best("insert_full", lambda: build_bloom_sharded(
        keys, "id", size2=SIZE2, nb_hash=8, n_shards=n_shards))
    probe_df = keys.select((F.col("id") * 2654435761 % N_KEYS).alias("id"))
    best("lookup_full", lambda: probe_count(probe_df, sk, "id"))
    keys.unpersist()
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--core":
        res = profile_core()
    elif args and args[0] == "--explain":
        names = args[1].split(",")
        suffix = args[2] if len(args) > 2 else "before"
        write_explains(names, suffix)
        res = {"explained": names}
    elif args and args[0] == "--all":
        from pimbloomfilters_spark.plans import CATALOG

        res = profile_queries(list(CATALOG))
    else:
        names = args[1].split(",") if len(args) > 1 else args[0].split(",")
        res = profile_queries(names, noop="--noop" in args)
    print(json.dumps(res))
