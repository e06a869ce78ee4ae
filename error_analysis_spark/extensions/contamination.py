"""Benchmark decontamination for training corpora.

The standard train-test contamination check (GPT-3 appendix C /
PaLM-style): a training document is contaminated if a large fraction of
its word n-grams also occur in an evaluation benchmark. Shape:

    1. per-doc DISTINCT n-gram sets — row-local array expressions
       (split → transform → array_distinct), no shuffle;
    2. the benchmark's global distinct-gram set — one aggregate over
       the (small) benchmark corpus;
    3. explode + semi-join doc grams against benchmark grams, count
       matches per doc.

Scale design: grams are md5-prefix int64 hashes (16 bytes each instead
of ~50-byte strings through the shuffle); the benchmark side is
broadcast by default — eval benchmarks are MBs while the training
corpus is TBs, which is exactly the broadcast-join asymmetry. With
`broadcast_bench=False` it degrades to a shuffle semi-join keyed on
well-distributed hashes (no skew: gram frequency skew is collapsed by
the per-doc distinct). Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from error_analysis_spark.extensions.text import tokens


def ngram_array(text: Column | str, n: int) -> Column:
    """Distinct word n-grams of a document as an array column (empty if
    the document has fewer than `n` tokens)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)) \
        .otherwise(F.array().cast("array<string>"))


def _gram_hash(g: Column) -> Column:
    # md5-prefix → int64: engine-independent, shuffle-compact
    return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")


def contamination_report(docs: DataFrame, bench: DataFrame, n: int = 8,
                         threshold: float = 0.5,
                         text_col: str = "text", id_col: str = "doc_id",
                         broadcast_bench: bool = True) -> DataFrame:
    """Per-document contamination against a benchmark corpus.

    Returns (doc_id, n_grams, n_matched, contam_frac, contaminated):
    `n_grams` distinct n-grams in the doc, `n_matched` of them that
    appear anywhere in `bench`, `contam_frac` their ratio (NULL for
    docs shorter than n tokens), `contaminated` = frac ≥ threshold.
    """
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        ngram_array(text_col, n).alias("grams"),
    ).select(
        "doc_id", F.size("grams").alias("n_grams"),
        F.explode_outer(F.transform(
            F.col("grams"), _gram_hash)).alias("gh"),
    )
    bench_grams = (bench
                   .select(F.explode(ngram_array(text_col, n)).alias("g"))
                   .select(_gram_hash(F.col("g")).alias("gh"))
                   .distinct())
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    matched = doc_grams.join(bench_grams, "gh", "left_semi")
    per_doc = (doc_grams.groupBy("doc_id")
               .agg(F.max("n_grams").alias("n_grams")))
    n_match = (matched.groupBy("doc_id")
               .agg(F.count("*").alias("n_matched")))
    frac = F.when(F.col("n_grams") > 0,
                  F.col("n_matched").cast("double") / F.col("n_grams"))
    return (per_doc.join(n_match, "doc_id", "left")
            .withColumn("n_matched", F.coalesce("n_matched", F.lit(0)))
            .select("doc_id", "n_grams", "n_matched",
                    F.round(frac, 6).alias("contam_frac"),
                    F.coalesce(frac >= threshold, F.lit(False))
                    .alias("contaminated")))
