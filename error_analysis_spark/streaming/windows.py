"""Event-time windowed aggregation with watermarks — the Structured
Streaming surface for the driver's `events` table (ts, event_type,
value).

`windowed_event_stats` is the canonical late-data-tolerant rollup:
tumbling event-time windows keyed by event_type, a watermark bounding
how late a record may arrive before its window's state is finalized
and dropped. In update/append mode the state store holds only windows
newer than (max event time − watermark) — bounded state at any scale.

The test delivers out-of-order micro-batches (including a record later
than the watermark allows) and checks the final table equals the batch
aggregation of exactly the records Structured Streaming guarantees to
include.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVENT_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double")


def stream_events(spark, path: str, max_files_per_trigger: int = 1):
    return (spark.readStream
            .schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_event_stats(events: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows per event_type with a late-data
    watermark: count, sum, mean of `value` (merge-exact moments, like
    streaming/incremental.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            # mean over OBSERVED values: `value` is nullable, and a
            # row-count denominator would dilute the mean with NULLs
            F.count("value").alias("_n_obs"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n",
            (F.col("sum_value") / F.col("_n_obs")).alias("mean_value"),
        )
    )


def sessionized_stream(events: DataFrame, gap_minutes: int = 30,
                       watermark: str = "2 hours") -> DataFrame:
    """Streaming gap-sessions: the SAME `temporal.sessionize` operator
    over a watermarked stream — session_window merges partial sessions
    in the state store and finalizes a session once the watermark
    passes its close (append mode emits exactly the finalized rows).
    State per key is bounded by the gap + watermark horizon."""
    from error_analysis_spark.operators.temporal import sessionize

    return sessionize(events.withWatermark("ts", watermark),
                      gap_minutes=gap_minutes)
