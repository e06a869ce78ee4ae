"""Streaming curation funnel parity: stream survivors must equal the
batch gates + first-arrival signature dedup over the same arrivals
(all dups inside the watermark), with each drop attributable to the
stage designed to catch it."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from error_analysis_spark.extensions import dedup as BD
from error_analysis_spark.extensions import text as TX
from error_analysis_spark.streaming import curation as SC
from error_analysis_spark.streaming import dedup as SD


def _mk_arrivals(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("curstream")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    batches = [
        [(1, "alpha beta gamma delta", "web"),     # kept
         (2, "1 1 1 1 1 1", "web")],               # quality drop
        [(3, "le la les de et un une pour", "web"),  # lang drop (fr)
         (4, "epsilon zeta eta theta", "book")],   # kept
        [(5, "alpha beta gamma delta", "web"),     # exact dup of 1
         (6, "delta gamma beta alpha", "book")],   # reorder near-dup of 1
        [(7, "iota kappa lambda mu", "web")],      # kept
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


def test_stream_curate_matches_batch(spark, tmp_path_factory):
    d, all_rows = _mk_arrivals(spark, tmp_path_factory)
    stream = SD.stream_documents(spark, str(d), max_files_per_trigger=1)
    kept = SC.stream_curate(stream, min_quality=0.5)
    q = (kept.writeStream.outputMode("append")
         .format("memory").queryName("curated_docs").start())
    q.processAllAvailable()
    q.stop()
    got = spark.table("curated_docs").toPandas()

    # stage attribution: 2 fails quality, 3 fails lang, 5/6 dedup to 1
    assert set(got["doc_id"]) == {1, 4, 7}
    assert (got["pred_lang"] == "en").all()
    assert (got["quality"] >= 0.5).all()

    # batch equivalent: same gates, first-arrival per signature key
    batch = (spark.createDataFrame(all_rows, SD.DOC_SCHEMA)
             .withColumn("quality", TX.quality_expr("text"))
             .where(F.col("quality") >= 0.5))
    batch = TX.lang_scores(batch).where(F.col("pred_lang") == "en")
    mins = BD.sig_mins_over(F.col("_mh"), 16, 42)
    sig = F.md5(F.concat_ws(",", *[m.cast("string") for m in mins]))
    batch = (batch.withColumn("_mh", BD.token_hashes("text"))
             .withColumn("sig_key", sig).drop("_mh"))
    first = (batch.toPandas().sort_values("doc_id")
             .groupby("sig_key").first())
    assert set(got["doc_id"]) == set(first["doc_id"])
    assert set(got["sig_key"]) == set(first.index)


def test_funnel_monitor_counts(spark, tmp_path_factory):
    d, all_rows = _mk_arrivals(spark, tmp_path_factory)
    stream = SD.stream_documents(spark, str(d), max_files_per_trigger=1)
    kept = SC.stream_curate(stream, min_quality=0.5)
    mon = SC.funnel_monitor(kept)
    q = (mon.writeStream.outputMode("complete")
         .format("memory").queryName("cur_mon").start())
    q.processAllAvailable()
    q.stop()
    got = (spark.table("cur_mon").toPandas()
           .set_index("source")["n_docs"].to_dict())
    assert got == {"web": 2, "book": 1}
