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

`batch_interval_join` is the SAME projection/condition built by the
shared `_build` helper minus the watermarks — the stream ≡ batch test
oracle, so the band predicate can never drift between the two forms.

The test drives out-of-order micro-batches through the join and checks
the result equals the equivalent batch range-join over the records the
watermark guarantees to retain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _build(lt: DataFrame, rt: DataFrame, key_col: str,
           max_lag_minutes: int) -> DataFrame:
    """Shared condition + projection over pre-shaped sides
    (k/l_id/l_ts vs rk/r_id/r_ts)."""
    lag_s = max_lag_minutes * 60
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


def _shape(df: DataFrame, key_col: str, ts_col: str, id_col: str,
           side: str) -> DataFrame:
    k, i, t = (("k", "l_id", "l_ts") if side == "left"
               else ("rk", "r_id", "r_ts"))
    return df.select(F.col(key_col).alias(k),
                     F.col(id_col).alias(i),
                     F.col(ts_col).alias(t))


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key_col: str = "user_id",
                         ts_col: str = "ts",
                         id_col: str = "event_id",
                         max_lag_minutes: int = 30,
                         left_watermark: str = "1 hour",
                         right_watermark: str = "1 hour") -> DataFrame:
    """Inner interval join of two watermarked streams on
    (key, right.ts in (left.ts − max_lag, left.ts]).

    Returns (key, left id/ts, right id/ts, lag seconds). Both inputs
    must be streaming DataFrames with `ts_col` of timestamp type."""
    lt = _shape(left.withWatermark(ts_col, left_watermark),
                key_col, ts_col, id_col, "left")
    rt = _shape(right.withWatermark(ts_col, right_watermark),
                key_col, ts_col, id_col, "right")
    return _build(lt, rt, key_col, max_lag_minutes)


def batch_interval_join(left: DataFrame, right: DataFrame,
                        key_col: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        max_lag_minutes: int = 30) -> DataFrame:
    """Batch reference semantics for `stream_interval_join` (same
    builder, no watermarks) — the stream ≡ batch test oracle."""
    lt = _shape(left, key_col, ts_col, id_col, "left")
    rt = _shape(right, key_col, ts_col, id_col, "right")
    return _build(lt, rt, key_col, max_lag_minutes)
