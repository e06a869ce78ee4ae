"""Dup-ngram coverage scale probe — linearity evidence for the
suffix-array-dedup stand-in (`text.dup_ngram_stats`).

Wide-vocabulary corpus (40 md5-derived tokens per doc) with one planted
near-copy per 10 docs sharing a 20-token prefix run with its partner
(so planted pairs contribute 13 duplicated 8-grams each side). Doubling
the corpus must ~double wall-clock (the plan is explode-linear + two
hash aggs on 64-bit keys), and dup coverage must flag exactly the
planted docs.

    SPARK_GRAFT_NGRAM_DOCS=100000,200000,400000 python bench_ngrams.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import text as TX
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_NGRAM_DOCS", "100000,200000,400000").split(",")]
    spark = get_spark("bench-ngrams")
    tok = (lambda s, j: F.substring(
        F.md5(F.concat(s.cast("string"), F.lit("_"), j.cast("string"))),
        1, 10))
    results = []
    for n in sizes:
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        # partner docs (id+10M) share tokens 0..19 with their base
        dups = (spark.range(0, n, 10)
                .select((F.col("id") + 10_000_000).alias("doc_id")))
        rel = F.col("doc_id") - 10_000_000
        text = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda j: F.when(
                    (F.col("doc_id") >= 10_000_000) & (j < 20),
                    tok(rel, j)).otherwise(tok(F.col("doc_id"), j))), " ")
        corpus = (base.unionByName(dups)
                  .select("doc_id", text.alias("text"))
                  .repartition(64).cache())
        corpus.count()
        t0 = time.perf_counter()
        out = TX.dup_ngram_stats(corpus, n=8).cache()
        flagged = out.where(F.col("n_dup") > 0).count()
        dt = round(time.perf_counter() - t0, 1)
        # every planted pair: 20-token shared prefix → 13 dup 8-grams
        # per member; nothing else shares any 8-gram
        expect = 2 * ((n + 9) // 10)
        results.append({"docs": n + (n + 9) // 10, "sec": dt,
                        "flagged": flagged, "expect_flagged": expect})
        out.unpersist(); corpus.unpersist()
    print(json.dumps({"metric": "dup_ngram_probe", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
