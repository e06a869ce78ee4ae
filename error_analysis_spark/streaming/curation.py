"""Streaming curation funnel — the batch `curate_documents` chain
(extensions/curation.py) re-expressed over a live ingest stream.

Stage layout is chosen for STATE, the scarce resource of a streaming
job: the quality gate and the language filter are pure row-local
expressions (quality_expr and the plan-time stopword profiles of
`lang_scores` — no join, no shuffle, no state), so they run first and
shrink the stream before anything stateful sees it. Dedup is ONE
watermark-bounded `dropDuplicatesWithinWatermark` state on the
row-local MinHash signature key: signature equality subsumes byte
equality (identical text ⇒ identical signature), so a single state
store gives the exact + near-dup guarantee — chaining a separate
exact-dedup state in front would double state size for zero extra
recall.

Parity with the batch funnel is tested in
tests/test_streaming_curation.py (stream survivors ≡ batch gates +
first-arrival signature dedup whenever duplicates arrive within the
watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from error_analysis_spark.extensions import text as TX
from error_analysis_spark.streaming import dedup as SD


def stream_curate(docs: DataFrame, min_quality: float = 0.3,
                  keep_langs: tuple = ("en",), num_perm: int = 16,
                  seed: int = 42, watermark: str = "1 hour",
                  text_col: str = "text",
                  time_col: str = "ingest_time") -> DataFrame:
    """quality gate → language filter → signature near-dedup over a
    streaming DataFrame. Returns the kept docs annotated with
    `quality`, `pred_lang` and the dedup `sig_key`."""
    in_cols = docs.columns
    q = (docs.withColumn("quality", TX.quality_expr(text_col))
         .where(F.col("quality") >= min_quality))
    scored = TX.lang_scores(q, text_col=text_col)
    kept_lang = (scored.where(F.col("pred_lang").isin(*keep_langs))
                 .select(*in_cols, "quality", "pred_lang"))
    return SD.stream_dedup_minhash(kept_lang, text_col=text_col,
                                   time_col=time_col, num_perm=num_perm,
                                   seed=seed, watermark=watermark)


def funnel_monitor(kept: DataFrame, text_col: str = "text",
                   group_col: str = "source") -> DataFrame:
    """Update-mode per-source monitor over the funnel survivors —
    associative counters only, so micro-batch partials merge exactly.
    Pass the same `text_col` given to `stream_curate` (and the grouping
    column of your schema) so the pair composes for non-default
    schemas."""
    return SD.running_source_stats(kept, text_col=text_col,
                                   group_col=group_col)
