"""Stream-stream interval join: watermark-bounded state, and the
micro-batched result equals the batch range join over the same records
(all records delivered within the watermark here, so equality is exact,
not a floor)."""

from __future__ import annotations

import pandas as pd

from error_analysis_spark.streaming import joins as SJ
from error_analysis_spark.streaming.windows import EVENT_SCHEMA


def _write_batch(spark, rows, path):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    (spark.createDataFrame(pdf).coalesce(1)
     .write.mode("overwrite").parquet(str(path) + ".tmp"))
    import glob
    import shutil
    part = glob.glob(f"{path}.tmp/part-*.parquet")[0]
    shutil.copy(part, path)
    shutil.rmtree(f"{path}.tmp")


_CLICKS = [
    (10, "2024-01-01 09:20:00", 1, "click", 0.0),
    (11, "2024-01-01 09:50:00", 1, "click", 0.0),
    (12, "2024-01-01 09:25:00", 2, "click", 0.0),   # no signup in range
    (13, "2024-01-01 10:40:00", 3, "click", 0.0),
]
_SIGNUPS = [
    (20, "2024-01-01 09:00:00", 1, "signup", 0.0),  # 20 min before #10
    (21, "2024-01-01 09:45:00", 1, "signup", 0.0),  # 5 min before #11
    (22, "2024-01-01 08:00:00", 2, "signup", 0.0),  # 85 min: outside 30m
    (23, "2024-01-01 10:39:00", 3, "signup", 0.0),
]


def test_stream_interval_join_matches_batch(spark, tmp_path_factory):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dl = tmp_path_factory.mktemp("clicks")
    dr = tmp_path_factory.mktemp("signups")
    # out-of-order delivery across micro-batches, all within watermark
    _write_batch(spark, [_CLICKS[1], _CLICKS[3]], dl / "b1.parquet")
    _write_batch(spark, [_CLICKS[0], _CLICKS[2]], dl / "b2.parquet")
    _write_batch(spark, [_SIGNUPS[2], _SIGNUPS[0]], dr / "b1.parquet")
    _write_batch(spark, [_SIGNUPS[1], _SIGNUPS[3]], dr / "b2.parquet")

    ls = (spark.readStream.schema(EVENT_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(str(dl)))
    rs = (spark.readStream.schema(EVENT_SCHEMA)
          .option("maxFilesPerTrigger", 1).parquet(str(dr)))
    j = SJ.stream_interval_join(ls, rs, max_lag_minutes=30)
    q = (j.writeStream.outputMode("append")
         .format("memory").queryName("ivjoin").start())
    q.processAllAvailable()
    q.stop()
    got = spark.table("ivjoin").toPandas() \
        .sort_values(["l_id", "r_id"]).reset_index(drop=True)

    lb = spark.createDataFrame(
        pd.DataFrame(_CLICKS, columns=["event_id", "ts", "user_id",
                                       "event_type", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.ts)))
    rb = spark.createDataFrame(
        pd.DataFrame(_SIGNUPS, columns=["event_id", "ts", "user_id",
                                        "event_type", "value"])
        .assign(ts=lambda d: pd.to_datetime(d.ts)))
    want = SJ.batch_interval_join(lb, rb, max_lag_minutes=30).toPandas() \
        .sort_values(["l_id", "r_id"]).reset_index(drop=True)

    assert got.equals(want), (got, want)
    # semantic spot checks: click #10 (09:20) matches signup #20
    # (09:00, 20 min); click #11 (09:50) matches only #21 (09:45,
    # 5 min) — #20 is 50 min back, outside the band; user 2's signup
    # is 85 minutes old — excluded entirely
    pairs = set(zip(got["l_id"], got["r_id"]))
    assert (11, 21) in pairs and (10, 20) in pairs
    assert (13, 23) in pairs
    assert not any(l == 12 for l, _ in pairs)
    assert (11, 20) not in pairs  # 50 min lag > 30 min band


def test_stream_interval_join_state_is_bounded(spark):
    # construct-level check: the physical streaming plan must carry
    # watermarks on both sides and a range condition — the pair that
    # lets Spark expire join state instead of buffering forever
    from pyspark.sql import functions as F
    ls = (spark.readStream.format("rate").option("rowsPerSecond", 1)
          .load()
          .select(F.col("value").alias("event_id"),
                  F.col("timestamp").alias("ts"),
                  (F.col("value") % 5).alias("user_id"),
                  F.lit("click").alias("event_type"),
                  F.lit(0.0).alias("value")))
    rs = (spark.readStream.format("rate").option("rowsPerSecond", 1)
          .load()
          .select(F.col("value").alias("event_id"),
                  F.col("timestamp").alias("ts"),
                  (F.col("value") % 5).alias("user_id"),
                  F.lit("signup").alias("event_type"),
                  F.lit(0.0).alias("value")))
    j = SJ.stream_interval_join(ls, rs, max_lag_minutes=5)
    plan = j._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2, plan
