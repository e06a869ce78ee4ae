"""Streaming deduplication for continuous training-data ingest.

The batch dedup family (extensions/dedup.py) assumes the corpus is at
rest; a live ingest pipeline needs the same guarantees per arriving
micro-batch. Two stages, both idiomatic Structured Streaming:

- **exact dedup**: content-hash `dropDuplicatesWithinWatermark` — the
  state store keeps one entry per hash and the event-time watermark
  bounds it (without a watermark the distinct-state grows forever; the
  watermark IS the retention contract a production ingest pipeline
  declares anyway).
- **running corpus stats**: tokens/docs per source in update mode —
  the merge-exact counter shape (streaming A1 analog) used to monitor
  a dedup funnel live.

Batch ≡ stream parity is tested (tests/test_streaming_dedup.py): the
streamed survivors equal batch `dropDuplicates` over the same files
whenever every duplicate pair arrives within the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC_SCHEMA = ("doc_id bigint, text string, source string, "
              "ingest_time timestamp")


def stream_documents(spark, path: str, max_files_per_trigger: int = 1):
    """File-source document stream: each arriving parquet file is one
    ingest micro-batch."""
    return (spark.readStream
            .schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_dedup_exact(docs: DataFrame, text_col: str = "text",
                       time_col: str = "ingest_time",
                       watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on content hash. State per distinct hash,
    evicted once the watermark passes — a duplicate arriving within
    `watermark` of the original is dropped; later re-arrivals are a
    new retention epoch (the documented streaming-dedup semantics)."""
    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    return (hashed
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["content_hash"]))


def running_source_stats(kept: DataFrame) -> DataFrame:
    """Update-mode funnel monitor: surviving docs + token volume per
    source — associative counters, so micro-batch partials merge
    exactly."""
    n_tok = F.size(F.filter(F.split(F.col("text"), r"\s+"),
                            lambda t: t != ""))
    return (kept.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(n_tok).alias("n_tokens")))
