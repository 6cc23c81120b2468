"""End-to-end training-data pipeline demo over the sandbox testdata.

Runs the full pre-tokenized pipeline with the library's public surface:

  1. derive the (doc_id, tokens, n_tok, source) table
  2. corpus stats via sketches (distinct tokens, heavy hitters, quantiles)
  3. repetition quality filter
  4. benchmark decontamination (13-token-gram Bloom screen; the held-out
     split stands in for an eval benchmark)
  4b. cross-document substring dedup (ExactSubstr find + remove)
  5. token-shingle MinHash near-dup removal
  6. per-source token-budget mixture sample
  7. deterministic epoch shuffle into balanced training shards
  8. context-window packing stats of the final mixture
  9. Bloom filter of the final corpus' tokens (for later membership probes)

Usage: python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pimbloomfilters_spark.functions.dedup import (  # noqa: E402
    exact_substr_spans_global, ngram_novelty, remove_token_spans,
    token_minhash_near_dup_pairs, token_ngram_decontaminate)
from pimbloomfilters_spark.functions.packing import packing_stats  # noqa: E402
from pimbloomfilters_spark.functions.text import token_repetition_stats  # noqa: E402
from pimbloomfilters_spark.operators import build_sketch  # noqa: E402
from pimbloomfilters_spark.operators.sampling import (  # noqa: E402
    epoch_shuffle, mixture_sample_tokens)
from pimbloomfilters_spark.session import get_spark  # noqa: E402
from pimbloomfilters_spark.sketches import make_sketch  # noqa: E402
from pimbloomfilters_spark.sources.tables import token_table, tokens_exploded  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("pipeline-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": sf_dir}

    tt = (token_table(spark, sf_dir)
          .withColumn("doc_id", F.col("doc_id").cast("long")))
    report["docs"] = tt.count()

    tok = tokens_exploded(spark, sf_dir)
    hll, _ = build_sketch(tok, "token_id",
                          functools.partial(make_sketch, "hll", p=14))
    kll, _ = build_sketch(tt, "n_tok",
                          functools.partial(make_sketch, "kll", k=200))
    report["distinct_tokens_est"] = round(hll.estimate(), 1)
    report["n_tok_p50_est"] = kll.quantile(0.5)

    rep_ok = (token_repetition_stats(tt)
              .filter(F.col("dup_frac") <= 0.05).select("doc_id"))
    kept = tt.join(rep_ok, "doc_id")
    report["after_repetition_filter"] = kept.count()

    bench = tt.filter(F.col("doc_id") % 50 == 0)
    screened = token_ngram_decontaminate(
        kept.filter(F.col("doc_id") % 50 != 0), bench, n=13)
    # cache: both the count and the anti-join read this, and re-evaluating
    # would re-run the Bloom build + full corpus screen
    dirty = screened.filter("contaminated").select("doc_id").cache()
    kept = (kept.filter(F.col("doc_id") % 50 != 0)
            .join(dirty, "doc_id", "left_anti"))
    report["contaminated_removed"] = dirty.count()
    report["after_decontamination"] = kept.count()
    # dirty stays cached: every later stage re-evaluates `kept`, which
    # reads it; the blob is a handful of doc ids

    # cross-document substring dedup (ExactSubstr): every later occurrence
    # of a duplicated >= 15-token run is cut, the first copy kept — the
    # CORPUS-GLOBAL cluster-per-code mode (O(f) per repeated run, the
    # scale-safe path; the pairwise exact_substr_spans reporter is for
    # targeted pair analysis only)
    # duplication pressure BEFORE the cut: mean first-occurrence fraction
    report["mean_novelty_pre"] = round(ngram_novelty(kept, k=13).agg(
        F.avg("novelty_frac")).collect()[0][0], 4)
    spans = exact_substr_spans_global(kept, k=13, min_span=15)
    # cache: the span window + removal would otherwise re-execute for
    # every downstream action that re-evaluates `kept` (same hazard the
    # `dirty` cache above documents)
    cleaned = remove_token_spans(
        kept.select("doc_id", "tokens"), spans, span_id_col="doc_id",
        start_col="start").cache()
    report["substr_spans_found"] = spans.count()
    report["substr_tokens_removed"] = cleaned.agg(
        F.sum("n_removed")).collect()[0][0]
    kept = (kept.drop("tokens", "n_tok")
            .join(cleaned.filter(F.col("n_tok") > 0), "doc_id"))

    drop = (token_minhash_near_dup_pairs(kept, threshold=0.7)
            .select(F.col("doc_b").alias("doc_id")).distinct())
    surv = kept.join(drop, "doc_id", "left_anti")
    report["after_near_dup_removal"] = surv.count()

    budgets = {r["source"]: 500 for r in surv.select("source").distinct().collect()}
    mixed = mixture_sample_tokens(surv, budgets, "doc_id")
    report["mixture_docs"] = mixed.count()

    # deterministic epoch shuffle: reproducible global order, balanced
    # round-robin shards (the training-reader handoff)
    sharded = epoch_shuffle(mixed, "doc_id", seed=0, n_shards=4)
    report["shard_sizes"] = [
        int(r["n"]) for r in sharded.groupBy("shard")
        .agg(F.count("*").alias("n")).orderBy("shard").collect()]

    report["packing"] = [r.asDict() for r in
                         packing_stats(mixed, 256).orderBy("source")
                         .limit(3).collect()]

    bloom, metrics = build_sketch(
        mixed, "tokens", functools.partial(make_sketch, "bloom",
                                           size2=22, nb_hash=8))
    report["final_bloom_weight"] = bloom.get_weight()
    report["build_metrics"] = {k: metrics[k] for k in ("n_rows", "n_values")}

    print(json.dumps(report, default=str))
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
