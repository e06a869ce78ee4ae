"""Driver-contract queries: variography operators (J4/A3/A4/F7, R6).

The driver's synthetic tables have no spatial grid, so the variogram
pipeline is exercised by mapping `events` onto a deterministic 2-D field:
x = (event_id % 97)·3, y = ⌊event_id/97⌋·3, value = value. The Spark side
runs the engine's *bucketed self-range-join* (operators.variogram.pair_bins
— the scale path); the oracle is the naive O(M²) self-join the reference
implements in numba (variography_uncertainty.py:364-431). Equality of the
two proves the bucket decomposition exact.

Bit-stability: `value` is cast to DECIMAL(18,2) before pairing so the
Σ(Δv)² accumulator is exact integer-scaled arithmetic on both engines —
the float sum-order problem cannot appear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.operators.variogram import (
    matheron, mean_variogram, pair_bins,
)
from error_analysis_spark.sources.tables import load_table

_BIN_W = 10.0
_MAX_LAG = 60.0
_MIN_PAIRS = 10


def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 5 == 0)
    return ev.select(
        F.col("event_id").alias("sample_id"),
        (F.col("event_id") % 97).cast("double") * 3.0,
        F.floor(F.col("event_id") / 97).cast("double") * 3.0,
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.lit(0).alias("run"),
    ).toDF("sample_id", "x", "y", "value", "run")


def j4_variogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _event_points(spark, sf_dir)
    binned = pair_bins(pts, max_lag=_MAX_LAG, bin_width=_BIN_W)
    ssd_d = F.col("ssd").cast("double")
    return binned.select(
        F.col("bin"),
        F.col("pair_count"),
        # round in DECIMAL, then cast — double-side rounding is
        # engine-dependent on exact 4-dp halves (same fix as
        # pipeline_chain's vario stage)
        F.round(F.col("ssd"), 4).cast("double").alias("ssd"),
        F.when(F.col("pair_count") >= _MIN_PAIRS,
               F.round(ssd_d / (2.0 * F.col("pair_count")), 6)).alias("gamma"),
    )


J4_SQL = f"""
WITH pts AS (
  SELECT event_id AS sid,
         CAST(event_id % 97 AS DOUBLE) * 3.0 AS x,
         CAST(event_id // 97 AS DOUBLE) * 3.0 AS y,
         CAST(value AS DECIMAL(18,2)) AS value
  FROM events WHERE event_id % 5 = 0
),
pairs AS (
  SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist,
         (a.value - b.value) * (a.value - b.value) AS sq
  FROM pts a JOIN pts b ON a.sid < b.sid
),
binned AS (
  SELECT CAST(floor(dist / {_BIN_W}) AS INTEGER) AS bin,
         count(*) AS pair_count,
         sum(sq) AS ssd_dec
  FROM pairs
  WHERE dist <= {_MAX_LAG}
  GROUP BY 1
)
SELECT bin, pair_count,
       CAST(round(ssd_dec, 4) AS DOUBLE) AS ssd,
       CASE WHEN pair_count >= {_MIN_PAIRS}
            THEN round(CAST(ssd_dec AS DOUBLE) / (2.0 * pair_count), 6)
       END AS gamma
FROM binned
"""


# --------------------------------------------------------------------------
# A5 — cross-run mean variogram: 4 runs (event_id % 4), Matheron per run,
# then per-bin mean/std/spread across runs
# --------------------------------------------------------------------------

def a5_mean_variogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 3 == 0)
    pts = ev.select(
        F.col("event_id").alias("sample_id"),
        (F.col("event_id") % 89).cast("double") * 3.0,
        F.floor(F.col("event_id") / 89).cast("double") * 3.0,
        F.col("value").cast("decimal(18,2)").alias("value"),
        (F.col("event_id") % 4).cast("int").alias("run"),
    ).toDF("sample_id", "x", "y", "value", "run")
    binned = pair_bins(pts, max_lag=_MAX_LAG, bin_width=_BIN_W)
    per_run = matheron(
        binned.withColumn("ssd", F.col("ssd").cast("double")))
    reduced = mean_variogram(per_run, bin_width=_BIN_W)
    return reduced.select(
        "bin", F.round("lag", 4).alias("lag"),
        F.round("gamma_mean", 6).alias("gamma_mean"),
        F.round("gamma_std", 6).alias("gamma_std"),
        F.round("gamma_spread", 6).alias("gamma_spread"),
        F.round("mean_pair_count", 4).alias("mean_pair_count"),
        "n_runs_valid",
    )


A5_SQL = f"""
WITH pts AS (
  SELECT event_id AS sid,
         CAST(event_id % 89 AS DOUBLE) * 3.0 AS x,
         CAST(event_id // 89 AS DOUBLE) * 3.0 AS y,
         CAST(value AS DECIMAL(18,2)) AS value,
         CAST(event_id % 4 AS INTEGER) AS run
  FROM events WHERE event_id % 3 = 0
),
pairs AS (
  SELECT a.run,
         sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist,
         (a.value - b.value) * (a.value - b.value) AS sq
  FROM pts a JOIN pts b ON a.run = b.run AND a.sid < b.sid
),
binned AS (
  SELECT run, CAST(floor(dist / {_BIN_W}) AS INTEGER) AS bin,
         count(*) AS pair_count,
         CAST(sum(sq) AS DOUBLE) AS ssd
  FROM pairs WHERE dist <= {_MAX_LAG}
  GROUP BY 1, 2
),
per_run AS (
  SELECT run, bin, pair_count,
         CASE WHEN pair_count >= {_MIN_PAIRS}
              THEN ssd / (2.0 * pair_count) END AS gamma
  FROM binned
)
SELECT bin,
       round({_BIN_W} / 2.0 + bin * {_BIN_W}, 4) AS lag,
       round(avg(gamma), 6) AS gamma_mean,
       round(stddev_samp(gamma), 6) AS gamma_std,
       round((quantile_cont(gamma, 0.975) - quantile_cont(gamma, 0.025))
             / 2.0, 6) AS gamma_spread,
       round(avg(pair_count), 4) AS mean_pair_count,
       count(gamma) AS n_runs_valid
FROM per_run GROUP BY bin
"""


VARIO_QUERIES: dict[str, tuple] = {
    "j4_variogram_bins": (j4_variogram_bins, J4_SQL),
    "a5_mean_variogram": (a5_mean_variogram, A5_SQL),
}
