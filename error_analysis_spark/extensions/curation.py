"""Document-curation pipeline — the training-data composition layer.

`curate_documents` chains the extension operators the way a pretraining
data pipeline does, as ONE lazy DataFrame DAG:

    1. quality gate       (text.quality_score ≥ min_quality)
    2. language filter    (text.lang_scores argmax ∈ keep_langs)
    3. exact dedup        (md5 groupBy; keep min doc_id per hash)
    4. near-dup dedup     (MinHash-LSH clusters via connected
                           components; keep the canonical = min id)
    5. token budgeting    (BPE-ish token counts on the survivors)

Everything is a join/aggregate composition over the same `documents`
long table — no collect, no driver loops; at 100 TB the only wide
stages are the dedup shuffles, which key on well-distributed hashes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from error_analysis_spark.extensions import dedup as DD
from error_analysis_spark.extensions import text as TX


@dataclass
class CurationConfig:
    min_quality: float = 0.3
    keep_langs: tuple = ("en",)
    near_dup_threshold: float = 0.8
    num_perm: int = 32
    bands: int = 8


def curate_documents(docs: DataFrame, cfg: CurationConfig | None = None,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> tuple[DataFrame, DataFrame]:
    """Returns (kept_docs, stage_stats).

    kept_docs: the surviving rows of `docs` plus `quality`, `pred_lang`,
    `n_bpe_tokens` columns. stage_stats: one row per pipeline stage with
    rows_in/rows_out (the curation funnel — what a data team audits).
    """
    cfg = cfg or CurationConfig()
    spark = docs.sparkSession
    n0 = docs.count()

    # 1. quality gate
    q = TX.quality_score(docs, text_col, id_col).select(
        F.col(id_col), "quality")
    staged = docs.join(q, id_col).where(F.col("quality") >= cfg.min_quality)
    n1 = staged.count()

    # 2. language filter
    langs = TX.lang_scores(staged, text_col, id_col).select(
        F.col(id_col), "pred_lang")
    staged = staged.join(langs, id_col).where(
        F.col("pred_lang").isin(*cfg.keep_langs))
    n2 = staged.count()

    # 3. exact dedup — keep the canonical (min id) copy
    canon = (staged.groupBy(F.md5(F.col(text_col)).alias("h"))
             .agg(F.min(id_col).alias(id_col)))
    staged = staged.join(canon.select(id_col), id_col, "left_semi")
    n3 = staged.count()

    # 4. near-dup dedup: MinHash-LSH pairs → components → keep min id
    pairs = DD.minhash_dedup(staged, text_col, id_col, cfg.num_perm,
                             cfg.bands, cfg.near_dup_threshold)
    vertices = staged.select(F.col(id_col).alias("id"))
    comp = DD.connected_components(pairs, vertices)
    keep = comp.where(F.col("id") == F.col("component")) \
        .select(F.col("id").alias(id_col))
    staged = staged.join(keep, id_col, "left_semi")
    n4 = staged.count()

    # 5. token budget on survivors
    kept = staged.withColumn(
        "n_bpe_tokens", F.size(TX.bpe_ish_tokens(F.col(text_col))))

    stats = spark.createDataFrame(
        [("input", n0, n0),
         ("quality_gate", n0, n1),
         ("language_filter", n1, n2),
         ("exact_dedup", n2, n3),
         ("near_dup_dedup", n3, n4)],
        "stage string, rows_in long, rows_out long")
    return kept, stats
