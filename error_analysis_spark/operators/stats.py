"""Descriptive / zonal / robust statistics — SURVEY.md §2.4 (A1-A16).

All aggregates are Spark built-ins (JVM hash-aggregate with map-side
partial aggregation — one shuffle of tiny partial states, never of raw
rows). Percentiles/medians use the exact `percentile` algorithm, not
approx, so results are oracle-stable.

Reference blocks re-expressed here:
  A1  stats block           stable_unstable_areas.py:549-584,
                            variography_uncertainty.py:246-257
  A2  zonal stats           stable_unstable_areas.py:641-671
  A6  median bias           notebook cell [74]
  A7  bootstrap median σ    variography_uncertainty.py:289-316
  A8  RMS                   variography_uncertainty.py:1544-1552, 1739-1764
  A13 pixel counts          stable_unstable_areas.py:445-454
  A15 bootstrap percentiles variography_uncertainty.py:891-928
  A16 symmetric bounds      differencing_functions.py:2432-2452
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def describe_exprs(value: str = "value", prefix: str = "") -> list[Column]:
    """A1 — the descriptive-stats aggregate block.

    mean, median, std/var (population, matching numpy ddof=0 used by the
    reference), min, max, skewness, kurtosis (population g1/g2, excess),
    p0.5/p99.5 clip bounds (stable_unstable_areas.py:556-557), quartiles and
    p1/p99 (variography_uncertainty.py:246-257), count.
    """
    v = F.col(value)
    p = prefix
    return [
        F.count(v).alias(p + "n"),
        F.avg(v).alias(p + "mean"),
        F.median(v).alias(p + "median"),
        F.stddev_pop(v).alias(p + "std"),
        F.var_pop(v).alias(p + "variance"),
        F.min(v).alias(p + "min"),
        F.max(v).alias(p + "max"),
        F.skewness(v).alias(p + "skewness"),
        F.kurtosis(v).alias(p + "kurtosis"),
        F.percentile(v, F.lit(0.005)).alias(p + "p005"),
        F.percentile(v, F.lit(0.25)).alias(p + "q1"),
        F.percentile(v, F.lit(0.75)).alias(p + "q3"),
        F.percentile(v, F.lit(0.995)).alias(p + "p995"),
    ]


def describe(df: DataFrame, value: str = "value") -> DataFrame:
    """A1 over the whole frame → single-row stats record."""
    return df.agg(*describe_exprs(value))


def zonal_stats(member_df: DataFrame, zone_col: str = "zone_id",
                value: str = "value") -> DataFrame:
    """A2 — `stats_each`: A1 grouped per zone (stable_unstable_areas.py:641-671).

    `member_df` is the output of the J2 membership join (operators.zones):
    one row per (zone, pixel). Canonical hash-aggregate; zones are few so
    the post-shuffle side is tiny.
    """
    return member_df.groupBy(zone_col).agg(*describe_exprs(value))


def median_bias(df: DataFrame, value: str = "value") -> DataFrame:
    """A6 — systematic vertical bias = median of stable-area Δz
    (np.median at notebook cell [74]; README.md:35)."""
    return df.agg(F.median(F.col(value)).alias("bias"))


def rms(df: DataFrame, value: str = "value") -> DataFrame:
    """A8 — root-mean-square √(mean(v²)) plus N (used as rms/√N for the
    uncorrelated term, variography_uncertainty.py:1544-1552)."""
    v = F.col(value)
    return df.agg(
        F.sqrt(F.avg(v * v)).alias("rms"),
        F.count(v).alias("n"),
    )


def sym_bounds(df: DataFrame, value: str = "value") -> DataFrame:
    """A16 — symmetric color bounds (−max|v|, +max|v|)
    (differencing_functions.py:2432-2452)."""
    m = F.max(F.abs(F.col(value)))
    return df.agg((-m).alias("vmin"), m.alias("vmax"))


def bootstrap_median_std(df: DataFrame, value: str = "value",
                         id_col: str = "row_id", n_boot: int = 1000,
                         fraction: float = 0.1, seed: int = 42) -> DataFrame:
    """A7 — uncertainty of the median bias: std of medians over `n_boot`
    resamples of `fraction` of the rows (variography_uncertainty.py:289-316).

    Distributed shape: fan the table out against `spark.range(n_boot)` and
    keep each (row, replicate) with probability `fraction` using a
    *deterministic* splitmix-style mix of (id, replicate, seed) — the
    Spark analog of the reference's seeded `np.random.choice`, but stable
    under any partitioning (SURVEY §4.2 deterministic-randomness note).
    The reference resamples WITH replacement; Bernoulli inclusion is the
    scalable equivalent and converges to the same median-σ estimate.
    One wide shuffle on (rep) — n_boot groups, each holding only its
    sampled values; partial aggregation keeps the fan-out from
    materializing n_boot× the data.
    """
    # enumerate each row's SURVIVING replicates inside one projection
    # (filter-then-explode): the n_boot-way fan-out materializes only
    # ~fraction·n_boot rows per input row instead of n_boot rows that a
    # crossJoin+filter would stream through the plan
    def _u(rep):
        # xxhash64 accepts ANY input type — a cast('long') here turned
        # every non-numeric id into NULL (one shared hash stream → all
        # replicates identical → median_std silently 0) and throws
        # under ANSI; hash the raw id
        return (F.pmod(F.xxhash64(F.col(id_col),
                                  rep.cast("long"), F.lit(seed)),
                       F.lit(1_000_000_007)).cast("double")
                / F.lit(1_000_000_007.0))
    kept = F.filter(F.sequence(F.lit(0), F.lit(n_boot - 1)),
                    lambda r: _u(r) < F.lit(fraction))
    fanned = df.withColumn("rep", F.explode(kept))
    per_rep = fanned.groupBy("rep").agg(F.median(F.col(value)).alias("med"))
    return per_rep.agg(
        F.stddev_samp("med").alias("median_std"),
        F.avg("med").alias("median_mean"),
        F.count("med").alias("n_reps"),
    )


def param_percentiles(boot_params: DataFrame, param_col: str = "param",
                      value: str = "value") -> DataFrame:
    """A15 — 16/50/84 percentiles per parameter over a bootstrap parameter
    matrix (variography_uncertainty.py:891-928)."""
    v = F.col(value)
    return boot_params.groupBy(param_col).agg(
        F.percentile(v, F.lit(0.16)).alias("p16"),
        F.percentile(v, F.lit(0.50)).alias("p50"),
        F.percentile(v, F.lit(0.84)).alias("p84"),
    )


def percentile_clip(df: DataFrame, value: str = "value",
                    lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """F6 — keep lo ≤ v ≤ hi percentile band
    (variography_uncertainty.py:259-260). Uses EXACT F.percentile so
    the bounds hash-match the DuckDB oracle (`f6_percentile_clip`).
    Scale note: the exact aggregate buffers a value→count map of the
    column's distinct values — at 100 TB of continuous doubles swap in
    F.approx_percentile (the reference's display-path semantics don't
    require exactness; only the oracle gate does)."""
    bounds = df.agg(
        F.percentile(F.col(value), F.lit(lo)).alias("lo"),
        F.percentile(F.col(value), F.lit(hi)).alias("hi"),
    ).first()
    return df.where(F.col(value).between(bounds["lo"], bounds["hi"]))
