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


def running_source_stats(kept: DataFrame, text_col: str = "text",
                         group_col: str = "source") -> DataFrame:
    """Update-mode funnel monitor: surviving docs + token volume per
    source — associative counters, so micro-batch partials merge
    exactly. Token counting delegates to the batch tokenizer so the
    monitor's n_tokens can never desynchronize from the funnel's."""
    from error_analysis_spark.extensions.text import tokens
    n_tok = F.size(tokens(text_col))
    return (kept.groupBy(group_col)
            .agg(F.count("*").alias("n_docs"),
                 F.sum(n_tok).alias("n_tokens")))


def stream_dedup_minhash(docs: DataFrame, text_col: str = "text",
                         time_col: str = "ingest_time",
                         num_perm: int = 16, seed: int = 42,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming signature-level near-dedup: the row-local MinHash
    signature (extensions.dedup.sig_mins_over — stateless expressions,
    so they run unchanged inside a streaming select) is hashed into one
    `sig_key`; a document whose FULL signature matches one seen within
    the watermark is dropped. Signature equality ⇔ Jaccard ≈ 1 over the
    token set, so this catches whitespace, token-reorder and
    near-identical variants that byte-exact dedup misses. Banding-OR
    semantics (drop on ANY band collision) need a per-doc vote over
    band-keyed state and stay a batch-side operation
    (extensions.dedup.minhash_dedup). Empty-token docs fall back to the
    exact md5 of the raw text."""
    from error_analysis_spark.extensions import dedup as BD

    mins = BD.sig_mins_over(F.col("_mh"), num_perm, seed)
    sig = F.md5(F.concat_ws(",", *[m.cast("string") for m in mins]))
    key = F.when(F.size("_mh") > 0, sig).otherwise(F.md5(F.col(text_col)))
    return (docs.withColumn("_mh", BD.token_hashes(text_col))
            .withColumn("sig_key", key)
            .drop("_mh")
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["sig_key"]))
