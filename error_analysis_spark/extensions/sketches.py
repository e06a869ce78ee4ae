"""Sketch-style scale primitives: KMV distinct-count sketches,
vocabulary heavy hitters, and int8 embedding quantization.

At 100 TB you cannot afford exact `COUNT(DISTINCT)` per high-cardinality
group or full-precision float32 embeddings in the ANN working set.
These operators are the deterministic (hence oracle-checkable) versions
of the usual probabilistic tools:

- **KMV (k-minimum-values)** distinct sketch (Bar-Yossef et al. 2002):
  hash every value to a uniform in (0,1) and keep the k smallest per
  group; if fewer than k distinct hashes exist the count is exact,
  otherwise estimate (k-1)/u_(k). Unlike HyperLogLog the estimator is
  a pure function of md5 hashes, so Spark and DuckDB agree bit-for-bit
  — and the k-set is mergeable (union two sketches = merge-sort and
  re-truncate to k), which is what makes it a partial aggregate at
  scale. The Spark plan keys one shuffle on the group and ranks
  per-group (bounded windows, no global sort).
- **Vocabulary top-k**: token heavy hitters with document-frequency
  floor — the vocab-building pass of a tokenizer pipeline. Aggregates
  are map-side-combinable counts; the final top-k is a
  TakeOrderedAndProject (never a full sort of the vocabulary).
- **int8 quantization**: per-vector symmetric scale (max-abs / 127),
  integer code stats and sequential-fold reconstruction error. Cuts
  the ANN memory footprint 4x; codes and checksums are integers, so
  exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO60 = float(1 << 60)


def _hash_u(col) -> F.Column:
    """md5-derived uniform in (0,1] — identical arithmetic in DuckDB."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
    return (h.cast("long") + F.lit(1)) / F.lit(_TWO60)


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns (group, n_kept, est_distinct): exact when the group has
    < k distinct values, else the KMV estimator (k-1)/u_(k), rounded
    to 4 decimals. One shuffle on the group key; the rank window is
    per-group (parallel, bounded by group size — and a production
    variant would pre-truncate per partition before the shuffle)."""
    hashed = (df.select(group_col, value_col).distinct()
              .withColumn("_u", _hash_u(F.col(value_col))))
    w = Window.partitionBy(group_col).orderBy("_u")
    ranked = hashed.withColumn("_rn", F.row_number().over(w)) \
        .where(F.col("_rn") <= k)
    return (ranked.groupBy(group_col)
            .agg(F.count("*").alias("n_kept"),
                 F.max("_u").alias("_uk"))
            .select(
                group_col, "n_kept",
                F.round(
                    F.when(F.col("n_kept") < k,
                           F.col("n_kept").cast("double"))
                    .otherwise((k - 1) / F.col("_uk")), 4)
                .alias("est_distinct")))


def vocab_topk(docs: DataFrame, k: int = 50, min_df: int = 2,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus vocabulary heavy hitters: the k most frequent tokens with
    document frequency >= min_df, ties broken by token. Token counts
    are map-side-combinable; df comes from the (token, doc) distinct;
    the final k rows come off a TakeOrderedAndProject, not a sort of
    the whole vocabulary."""
    from error_analysis_spark.extensions.text import tokens
    pairs = docs.select(F.col(id_col).alias("_id"),
                        F.explode(tokens(text_col)).alias("token"))
    stats = pairs.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct("_id").alias("df"))
    return (stats.where(F.col("df") >= min_df)
            .orderBy(F.desc("tf"), F.asc("token"))
            .limit(k))


def quantize_embeddings(emb: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric int8 quantization stats per vector.

    code_i = round(127 * x_i / max_abs) in [-127, 127]. Returns integer
    code aggregates (exact across engines: code_sum, positional
    code_checksum = sum (i+1)*code_i, n_sat saturated codes) plus the
    rounded scale and sequential-fold reconstruction MSE. Pure
    expression pipeline — no shuffle, no UDF."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(v, F.lit(0.0),
                       lambda a, x: F.greatest(a, F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(amax > 0, F.transform(
        v, lambda x: F.round(x / scale).cast("long"))) \
        .otherwise(F.transform(v, lambda x: F.lit(0).cast("long")))
    n = F.size(F.col(vec_col))
    code_sum = F.aggregate(codes, F.lit(0).cast("long"), lambda a, c: a + c)
    # index via the 2-arg transform lambda, NOT sequence(1, n):
    # sequence(1, 0) on an EMPTY vector counts DOWN to [1, 0] and the
    # zip_with null-pads — checksum came out NULL instead of 0
    checksum = F.transform(
        codes, lambda c, i: c * (i + 1).cast("long"))
    code_checksum = F.aggregate(checksum, F.lit(0).cast("long"),
                                lambda a, c: a + c)
    n_sat = F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda a, c: a + (F.abs(c) == 127).cast("long"))
    mse = F.when(amax > 0, F.aggregate(
        F.zip_with(v, codes, lambda x, c: F.pow(x - c * scale, F.lit(2.0))),
        F.lit(0.0), lambda a, e: a + e) / n).otherwise(F.lit(0.0))
    return emb.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        code_sum.alias("code_sum"),
        code_checksum.alias("code_checksum"),
        n_sat.alias("n_sat"),
        F.round(mse, 9).alias("mse"))
