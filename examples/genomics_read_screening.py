"""Genomics read-screening demo — the reference's own workflow end-to-end.

  1. synthesize a reference genome set and two read populations
  2. build a Bloom filter over the reference's canonical k-mers
  3. screen both read populations (match counts per read, no join)
  4. estimate genome size (HLL distinct k-mers) and pairwise genome
     similarity (Mash sketches) from the same k-mer stream

Usage: python examples/genomics_read_screening.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pimbloomfilters_spark.functions.kmer import (  # noqa: E402
    dna_kmers,
    kmer_minhash_signatures,
    synth_dna,
)
from pimbloomfilters_spark.operators import build_sketch, probe_key_column  # noqa: E402
from pimbloomfilters_spark.session import get_spark  # noqa: E402
from pimbloomfilters_spark.sketches import make_sketch  # noqa: E402

K = 21


def main() -> None:
    spark = get_spark("genomics-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    reference = synth_dna(spark, 100, 200)
    reads = synth_dna(spark, 50, 200, id_offset=100)          # same population
    contaminants = synth_dna(spark, 50, 200, id_offset=1000,
                             stride=41)                        # disjoint

    ref_kmers = dna_kmers(reference, k=K, canonical=True).cache()
    bloom, _ = build_sketch(ref_kmers, "kmer",
                            functools.partial(make_sketch, "bloom",
                                              size2=22, nb_hash=8))
    hll, _ = build_sketch(ref_kmers, "kmer",
                          functools.partial(make_sketch, "hll", p=14))

    probes = dna_kmers(reads.unionAll(contaminants), k=K, canonical=True)
    screened = (probe_key_column(probes, bloom, "kmer")
                .groupBy("seq_id")
                .agg(F.count("*").alias("n_kmers"),
                     F.sum(F.col("member").cast("int")).alias("n_matched"))
                .withColumn("match_pct",
                            (F.col("n_matched") * 100 / F.col("n_kmers"))
                            .cast("int")))
    pdf = screened.toPandas()
    same = pdf[pdf.seq_id < 1000]
    cont = pdf[pdf.seq_id >= 1000]

    sigs = kmer_minhash_signatures(reference.limit(10), k=K, num_hashes=256)
    rows = sigs.collect()
    import numpy as np
    sim01 = float(np.mean(np.array(rows[0]["sig"]) == np.array(rows[1]["sig"])))

    print(json.dumps({
        "reference_genomes": 100,
        "genome_size_est_distinct_kmers": round(hll.estimate(), 1),
        "bloom_weight": bloom.get_weight(),
        "same_population_reads": {
            "n": len(same), "mean_match_pct": float(same.match_pct.mean())},
        "contaminant_reads": {
            "n": len(cont), "mean_match_pct": float(cont.match_pct.mean())},
        "mash_jaccard_genome0_vs_1_est": sim01,
    }))
    ref_kmers.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
