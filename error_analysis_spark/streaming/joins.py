"""Stream-stream interval join with watermark-bounded state — the last
piece of the Structured Streaming join surface (stream-static joins
live in streaming/incremental.py).

`stream_interval_join` correlates two event streams per user within a
time band: each click joins the signups of the SAME user that happened
in (click.ts − max_lag, click.ts]. Both sides carry watermarks and the
join condition carries an explicit time-range predicate — that pair is
what lets Spark expire buffered rows: a left row older than
(watermark − max_lag) can never match a future right row, so the state
store stays bounded at roughly rate × (watermark + max_lag) per key
regardless of how long the stream runs. Without the range predicate a
stream-stream inner join would buffer BOTH streams forever.

The test drives out-of-order micro-batches through the join and checks
the result equals the equivalent batch range-join over the records the
watermark guarantees to retain — the same stream ≡ batch contract as
the rest of streaming/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key_col: str = "user_id",
                         ts_col: str = "ts",
                         max_lag_minutes: int = 30,
                         left_watermark: str = "1 hour",
                         right_watermark: str = "1 hour") -> DataFrame:
    """Inner interval join of two watermarked streams on
    (key, right.ts in (left.ts − max_lag, left.ts]).

    Returns (key, left event id/ts, right event id/ts, lag seconds).
    Both inputs must be streaming DataFrames with `ts_col` of
    timestamp type; column names are disambiguated by prefixing."""
    lag_s = max_lag_minutes * 60
    lt = (left.withWatermark(ts_col, left_watermark)
          .select(F.col(key_col).alias("k"),
                  F.col("event_id").alias("l_id"),
                  F.col(ts_col).alias("l_ts")))
    rt = (right.withWatermark(ts_col, right_watermark)
          .select(F.col(key_col).alias("rk"),
                  F.col("event_id").alias("r_id"),
                  F.col(ts_col).alias("r_ts")))
    cond = ((F.col("k") == F.col("rk"))
            & (F.col("r_ts") > F.col("l_ts") - F.expr(
                f"INTERVAL {lag_s} SECONDS"))
            & (F.col("r_ts") <= F.col("l_ts")))
    return (lt.join(rt, cond)
            .select(F.col("k").alias(key_col), "l_id",
                    F.unix_micros("l_ts").alias("l_ts_us"),
                    "r_id", F.unix_micros("r_ts").alias("r_ts_us"),
                    ((F.unix_micros("l_ts") - F.unix_micros("r_ts"))
                     / F.lit(1_000_000)).cast("long").alias("lag_s")))


def batch_interval_join(left: DataFrame, right: DataFrame,
                        key_col: str = "user_id", ts_col: str = "ts",
                        max_lag_minutes: int = 30) -> DataFrame:
    """Batch reference semantics for `stream_interval_join` (same
    projection, plain range join) — the stream ≡ batch test oracle."""
    lag_s = max_lag_minutes * 60
    lt = left.select(F.col(key_col).alias("k"),
                     F.col("event_id").alias("l_id"),
                     F.col(ts_col).alias("l_ts"))
    rt = right.select(F.col(key_col).alias("rk"),
                      F.col("event_id").alias("r_id"),
                      F.col(ts_col).alias("r_ts"))
    cond = ((F.col("k") == F.col("rk"))
            & (F.col("r_ts") > F.col("l_ts") - F.expr(
                f"INTERVAL {lag_s} SECONDS"))
            & (F.col("r_ts") <= F.col("l_ts")))
    return (lt.join(rt, cond)
            .select(F.col("k").alias(key_col), "l_id",
                    F.unix_micros("l_ts").alias("l_ts_us"),
                    "r_id", F.unix_micros("r_ts").alias("r_ts_us"),
                    ((F.unix_micros("l_ts") - F.unix_micros("r_ts"))
                     / F.lit(1_000_000)).cast("long").alias("lag_s")))
