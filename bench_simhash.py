"""SimHash Hamming-radius pair-search scale probe — linearity +
planted-recall evidence for `dedup.simhash_near_pairs` (pigeonhole
banding, no all-pairs join).

Corpus: wide-vocabulary docs (24 md5-derived tokens). One planted
exact-duplicate partner per 50 docs (Hamming distance 0 — MUST be
found; exactness within the radius is separately test-asserted against
brute force in tests/test_round7_ops.py, so the probe's job is recall
of the planted set + wall-clock shape). Doubling the corpus must
~double wall: band fan-out is row-local and the candidate join is
bucketed by (band, band_bits).

    SPARK_GRAFT_SIMHASH_DOCS=100000,200000 python bench_simhash.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import dedup as DD
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SIMHASH_DOCS", "100000,200000").split(",")]
    spark = get_spark("bench-simhash")
    results = []
    tok = (lambda s, j: F.substring(
        F.md5(F.concat(s.cast("string"), F.lit("_"), j.cast("string"))),
        1, 10))
    for n in sizes:
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        dups = (spark.range(0, n, 50)
                .select((F.col("id") + 10_000_000).alias("doc_id")))
        rel = F.when(F.col("doc_id") >= 10_000_000,
                     F.col("doc_id") - 10_000_000).otherwise(F.col("doc_id"))
        text = F.array_join(F.transform(
            F.sequence(F.lit(0), F.lit(23)), lambda j: tok(rel, j)), " ")
        corpus = (base.unionByName(dups)
                  .select("doc_id", text.alias("text"))
                  .repartition(64).cache())
        corpus.count()
        t0 = time.perf_counter()
        pairs = DD.simhash_near_pairs(corpus, bits=48, max_hamming=3) \
            .cache()
        n_pairs = pairs.count()
        planted_found = pairs.where(
            (F.col("id_b") - F.col("id_a") == 10_000_000)
            & (F.col("hamming") == 0)).count()
        dt = round(time.perf_counter() - t0, 1)
        pairs.unpersist()
        corpus.unpersist()
        results.append({"docs": n + (n + 49) // 50, "sec": dt,
                        "pairs": n_pairs,
                        "planted_found": planted_found,
                        "planted": (n + 49) // 50})
    print(json.dumps({"metric": "simhash_pairs_probe", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
