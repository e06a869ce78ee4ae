"""Incremental-dedup scale probe — evidence that screening a delta
against a corpus costs O(|delta|), not O(|corpus|) pair work.

Same wide-vocabulary synthesis as bench_lsh.py (40 md5-derived tokens
per doc, ~0 cross-doc Jaccard). The corpus is held FIXED while the
delta doubles; a delta-proportional runtime (with a flat corpus-side
floor for building/scanning the hash + LSH index, which in production
is persisted and not rebuilt per batch) is the pass condition. Planted
structure in every delta: 1/4 exact copies of corpus docs, 1/4 near
copies (4 of 40 tokens changed, Jaccard ≈ 0.82), 1/2 fresh docs —
statuses must come out exact_dup / near_dup / kept respectively.

    SPARK_GRAFT_INC_CORPUS=200000 SPARK_GRAFT_INC_DELTAS=25000,50000 \
        python bench_incremental.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _synth(spark, ids, seed_col, n_tok=40, mutate_first=0):
    """40-token doc per row; the first `mutate_first` tokens are drawn
    from a delta-unique stream instead of the seed's (near-copy knob)."""
    from pyspark.sql import functions as F
    tok = (lambda s, j: F.substring(
        F.md5(F.concat(s.cast("string"), F.lit("_"), j.cast("string"))),
        1, 10))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_tok - 1)),
            lambda j: F.when(j < mutate_first,
                             tok(F.col("doc_id") + 77_000_000, j))
            .otherwise(tok(seed_col, j))), " ")
    return ids.select("doc_id", text.alias("text"))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import dedup as DD
    from error_analysis_spark.session import get_spark

    n_corpus = int(os.environ.get("SPARK_GRAFT_INC_CORPUS", "200000"))
    deltas = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_INC_DELTAS", "25000,50000,100000").split(",")]
    spark = get_spark("bench-incremental")

    corpus = _synth(
        spark,
        spark.range(n_corpus).select(F.col("id").alias("doc_id")),
        F.col("doc_id")).repartition(64).cache()
    corpus.count()
    # production shape: the screening index is built ONCE per curated
    # corpus and persisted; each arriving batch only probes it
    index = DD.build_corpus_index(corpus, num_perm=16, bands=8)
    for k in index:
        index[k] = index[k].cache()
        index[k].count()

    results = []
    for n_delta in deltas:
        q = n_delta // 4
        ids = (spark.range(n_delta)
               .select((F.col("id") + 10_000_000).alias("doc_id")))
        # seed: first quarter exact-copies corpus doc (id-10M), second
        # quarter near-copies it, rest fresh (delta-unique seed)
        rel = F.col("doc_id") - 10_000_000
        seed = F.when(rel < 2 * q, rel).otherwise(F.col("doc_id"))
        delta = (_synth(spark, ids, seed)
                 .withColumn("_mut", (F.col("doc_id") - 10_000_000 >= q)
                             & (F.col("doc_id") - 10_000_000 < 2 * q)))
        # near copies: rebuild with 4 mutated tokens
        near = _synth(spark, ids.where((rel >= q) & (rel < 2 * q)),
                      rel, mutate_first=4)
        exact_fresh = delta.where(~F.col("_mut")).drop("_mut")
        delta = exact_fresh.unionByName(near).repartition(32).cache()
        delta.count()

        t0 = time.perf_counter()
        out = DD.incremental_dedup(corpus, delta, num_perm=16, bands=8,
                                   threshold=0.7, index=index)
        counts = {r["status"]: r["n"] for r in
                  out.groupBy("status").agg(F.count("*").alias("n"))
                  .collect()}
        dt = round(time.perf_counter() - t0, 1)
        row = {"delta": n_delta, "sec": dt, "statuses": counts,
               "expect": {"exact_dup": q, "near_dup": q,
                          "kept": n_delta - 2 * q}}
        results.append(row)
        delta.unpersist()

    print(json.dumps({"metric": "incremental_dedup_probe",
                      "corpus": n_corpus, "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
