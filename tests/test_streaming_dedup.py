"""Streaming exact-dedup parity: survivors of the micro-batched stream
must equal batch dropDuplicates over the same arrivals (all duplicates
arrive within the watermark here), and the funnel monitor's counters
must merge exactly across micro-batches."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from error_analysis_spark.streaming import dedup as SD


def _mk_arrivals(spark, tmp_path_factory):
    """4 micro-batch files; doc text repeats across batches (dups) and
    within a batch."""
    d = tmp_path_factory.mktemp("docstream")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    batches = [
        [(1, "alpha beta", "web"), (2, "gamma", "web")],
        [(3, "alpha beta", "book"), (4, "delta eps", "web")],
        [(5, "gamma", "web"), (6, "zeta", "book"), (7, "zeta", "book")],
        [(8, "alpha beta", "web"), (9, "eta theta iota", "book")],
    ]
    rows_all = []
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            [(i_, t, s, t0 + dt.timedelta(minutes=i)) for i_, t, s in rows],
            columns=["doc_id", "text", "source", "ingest_time"])
        rows_all.append(pdf)
        (spark.createDataFrame(pdf, SD.DOC_SCHEMA).coalesce(1)
         .write.parquet(str(d / f"b{i}"), mode="overwrite"))
    import glob
    import shutil
    for i in range(len(batches)):
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(part, str(d / f"arrival_{i}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))
    return d, pd.concat(rows_all, ignore_index=True)


def test_stream_dedup_matches_batch(spark, tmp_path_factory):
    d, all_rows = _mk_arrivals(spark, tmp_path_factory)
    stream = SD.stream_documents(spark, str(d), max_files_per_trigger=1)
    kept = SD.stream_dedup_exact(stream)
    q = (kept.writeStream.outputMode("append")
         .format("memory").queryName("kept_docs").start())
    q.processAllAvailable()
    q.stop()
    got = spark.table("kept_docs").toPandas()

    batch = (spark.createDataFrame(all_rows, SD.DOC_SCHEMA)
             .withColumn("content_hash", F.md5("text"))
             .dropDuplicates(["content_hash"]))
    # batch dropDuplicates keeps an arbitrary row per hash; compare on
    # the hash set (the dedup contract) and survivor count
    assert set(got["content_hash"]) == \
        {r["content_hash"] for r in batch.collect()}
    assert len(got) == batch.count()
    # the earliest arrival of each hash is the one kept
    first = (all_rows.assign(h=[__import__("hashlib").md5(
        t.encode()).hexdigest() for t in all_rows["text"]])
        .sort_values("doc_id").groupby("h").first())
    assert set(got["doc_id"]) == set(first["doc_id"])


def test_running_source_stats_merge_exact(spark, tmp_path_factory):
    d, all_rows = _mk_arrivals(spark, tmp_path_factory)
    stream = SD.stream_documents(spark, str(d), max_files_per_trigger=1)
    stats = SD.running_source_stats(stream)
    q = (stats.writeStream.outputMode("complete")
         .format("memory").queryName("src_stats").start())
    q.processAllAvailable()
    q.stop()
    got = (spark.table("src_stats").toPandas()
           .sort_values("source").reset_index(drop=True))
    want = (all_rows.assign(
        n_tok=[len(t.split()) for t in all_rows["text"]])
        .groupby("source").agg(n_docs=("doc_id", "count"),
                               n_tokens=("n_tok", "sum")).reset_index())
    assert list(got["source"]) == list(want["source"])
    assert list(got["n_docs"]) == list(want["n_docs"])
    assert list(got["n_tokens"]) == list(want["n_tokens"])


def test_stream_dedup_minhash_catches_reordered(spark, tmp_path_factory):
    """Near-dedup stream: token-reordered / re-spaced variants share a
    MinHash signature and are dropped; genuinely different docs
    survive; survivors equal batch dropDuplicates on the same key."""
    import glob
    import shutil

    d = tmp_path_factory.mktemp("neardup")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    batches = [
        [(1, "alpha beta gamma", "web"), (2, "delta epsilon", "web")],
        [(3, "gamma  alpha   beta", "book"),   # reorder+spacing of 1
         (4, "delta epsilon", "web")],          # exact dup of 2
        [(5, "zeta eta theta", "web")],
    ]
    rows_all = []
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(
            [(i_, t, s, t0 + dt.timedelta(minutes=i)) for i_, t, s in rows],
            columns=["doc_id", "text", "source", "ingest_time"])
        rows_all.append(pdf)
        (spark.createDataFrame(pdf, SD.DOC_SCHEMA).coalesce(1)
         .write.parquet(str(d / f"b{i}"), mode="overwrite"))
    for i in range(len(batches)):
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(part, str(d / f"arrival_{i}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    stream = SD.stream_documents(spark, str(d), max_files_per_trigger=1)
    kept = SD.stream_dedup_minhash(stream)
    q = (kept.writeStream.outputMode("append")
         .format("memory").queryName("near_kept").start())
    q.processAllAvailable()
    q.stop()
    got = spark.table("near_kept").toPandas()

    # doc 3 (reordered copy of 1) and doc 4 (exact copy of 2) dropped
    assert set(got["doc_id"]) == {1, 2, 5}
    # parity: batch dedup over the same stateless key keeps the same set
    all_rows = pd.concat(rows_all, ignore_index=True)
    from error_analysis_spark.extensions import dedup as BD
    bdf = spark.createDataFrame(all_rows, SD.DOC_SCHEMA)
    mins = BD.sig_mins_over(F.col("_mh"), 16, 42)
    sig = F.md5(F.concat_ws(",", *[m.cast("string") for m in mins]))
    keys = (bdf.withColumn("_mh", BD.token_hashes("text"))
            .withColumn("sig_key", sig).drop("_mh"))
    assert set(got["sig_key"]) == \
        {r["sig_key"] for r in keys.dropDuplicates(["sig_key"]).collect()}
