"""End-to-end curation-funnel scale probe (quality → language → exact
dedup → MinHash-LSH near-dedup → token budget) — the full
training-data-pipeline story at 100k-500k documents.

The corpus is synthesized row-locally with the statistical structure
each stage needs (the driver's `documents` table is both too small and
too vocabulary-degenerate for this):

- 60 tokens/doc: ~30% drawn from a language's stopword list, the rest
  md5-derived words from an effectively unbounded vocabulary;
- ~20% of docs are French-flavored (fr stopwords) → dropped by the
  language gate;
- one exact-duplicate partner per 50 base docs (same token stream) and
  one near-duplicate partner per 50 (4 of 60 tokens replaced,
  Jaccard ≈ 0.87) → removed by the exact and LSH stages respectively.

Prints one JSON line with wall-clock, per-stage rows_in/rows_out, and
the planted-duplicate removal counts. Run directly:

    SPARK_GRAFT_CURATION_DOCS=100000 python bench_curation.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions.curation import (
        CurationConfig, curate_documents,
    )
    from error_analysis_spark.extensions.text import STOPWORDS
    from error_analysis_spark.session import get_spark

    n_docs = int(os.environ.get("SPARK_GRAFT_CURATION_DOCS", "100000"))
    spark = get_spark("bench-curation")

    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    fr = F.array(*[F.lit(w) for w in STOPWORDS["fr"]])

    # partner seeds start at 1 / 27: both ≢ 0 (mod 5), so the planted
    # duplicates land in the ENGLISH bucket and actually reach the
    # dedup stages instead of dying at the language gate
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    exact = (spark.range(1, n_docs, 50)
             .select((F.col("id") + 10_000_000).alias("doc_id")))
    near = (spark.range(27, n_docs, 50)
            .select((F.col("id") + 20_000_000).alias("doc_id")))
    docs = base.unionByName(exact).unionByName(near)

    seed = (F.col("doc_id") % 10_000_000)
    is_near = F.col("doc_id") >= 20_000_000
    sw = F.when(seed % 5 == 0, fr).otherwise(en)

    def tok(j):
        # near-dup partners replace tokens 0-3 (different salt);
        # everything else streams from the shared per-seed md5 chain
        salt = F.when(is_near & (j < 4), F.lit("x")).otherwise(F.lit("t"))
        h = F.conv(F.substring(F.md5(F.concat(
            seed.cast("string"), F.lit("_"), j.cast("string"), salt)),
            1, 7), 16, 10).cast("long")
        word = F.substring(F.md5(F.concat(
            salt, seed.cast("string"), F.lit("w"), j.cast("string"))), 1, 6)
        return F.when(h % 10 < 3,
                      F.element_at(sw, (h % 10).cast("int") + 1)) \
                .otherwise(word)

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(59)), tok), " ")
    corpus = docs.select("doc_id", text.alias("text")) \
        .repartition(64).cache()
    n_total = corpus.count()

    t0 = time.perf_counter()
    kept, stats = curate_documents(
        corpus, CurationConfig(near_dup_threshold=0.8, num_perm=16))
    stage_rows = [r.asDict() for r in stats.collect()]
    n_kept = kept.count()
    dt = round(time.perf_counter() - t0, 1)

    kept_ids = kept.select("doc_id")
    exact_survivors = kept_ids.where(
        F.col("doc_id") >= 10_000_000).where(
        F.col("doc_id") < 20_000_000).count()
    near_survivors = kept_ids.where(F.col("doc_id") >= 20_000_000).count()
    print(json.dumps({
        "metric": "curation_funnel_sec", "value": dt, "unit": "sec",
        "docs": n_total, "kept": n_kept,
        "stages": stage_rows,
        "planted_exact": len(range(1, n_docs, 50)),
        "exact_survivors": exact_survivors,
        "planted_near": len(range(27, n_docs, 50)),
        "near_survivors": near_survivors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
