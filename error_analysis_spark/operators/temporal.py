"""Temporal operators over event streams: session windows and as-of
joins.

These are the two standard event-time operations the reference's
catalog/worklist layer never needed but any telemetry/training-data
pipeline does:

- `sessionize`: gap-based session windows per key. Spark-first: the
  built-in `F.session_window` (a SessionWindow aggregate — state merges
  map-side, one shuffle on the grouping key) rather than a hand-rolled
  gaps-and-islands window chain; the same call works under Structured
  Streaming with a watermark, which is why the operator takes a plain
  DataFrame. Output bounds are epoch-micros longs so the result is
  engine-portable (the DuckDB oracle reproduces the grouping with a
  lag/prefix-sum gaps-and-islands formulation).
- `asof_join`: for every left ("probe") row, the latest right
  ("reference") row with ts <= probe ts for the same key. Implemented
  as the union-and-carry-forward plan: tag both sides, sort within the
  key partition by (ts, side, id) — reference rows first on ties — and
  run `last(..., ignorenulls=True)` over an unbounded-preceding window.
  ONE shuffle on the key, no range join, no per-row subquery; the
  window partitions by key so there is no global-sort funnel. Ties are
  broken deterministically (max ts, then max id), matching a LATERAL
  `ORDER BY ts DESC, id DESC LIMIT 1` oracle.

At 100 TB both operators shuffle once on the key column and their
window/session state is bounded per key, so skew in the key histogram
(one user with millions of events) is the only hazard — mitigate with
AQE skew handling; the plans contain no single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30,
               key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Gap-based sessions per key via the native session_window
    aggregate. A session's end is last-event + gap (Spark semantics:
    an event exactly gap after the previous one opens a NEW session).
    Returns per session: key, start/end epoch-micros, n_events,
    rounded value sum."""
    gap = f"{int(gap_minutes)} minutes"
    # testdata timestamps are NTZ; unix_micros needs TIMESTAMP — callers
    # pin spark.sql.session.timeZone=UTC so the cast is unambiguous.
    # Only cast when needed: a cast would strip the watermark tag a
    # streaming caller attached to the raw column.
    ts = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) != "timestamp":
        ts = ts.cast("timestamp")
    return (events
            .groupBy(key_col, F.session_window(ts, gap).alias("w"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum(value_col), 6).alias("sum_value"))
            .select(
                key_col,
                F.unix_micros("w.start").alias("session_start_us"),
                F.unix_micros("w.end").alias("session_end_us"),
                "n_events", "sum_value"))


def asof_join(left: DataFrame, right: DataFrame, key_col: str,
              ts_col: str, id_col: str,
              right_value_col: str) -> DataFrame:
    """Latest-right-at-or-before-left as-of join.

    Returns every `left` row with `asof_ts_us` / `asof_<value>` from
    the matched right row (null when no right row precedes it).
    Deterministic tie policy: equal timestamps match (right side wins
    ties by larger id)."""
    lt = (left.select(
        F.col(key_col), F.col(id_col).alias("probe_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"))
        .withColumn("_side", F.lit(1)))
    rt = (right.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tus"),
        F.col(id_col).alias("_rid"),
        F.col(right_value_col).alias("_rval"))
        .withColumn("_side", F.lit(0)))
    u = lt.unionByName(rt, allowMissingColumns=True)
    # reference rows sort before probes at equal ts (side 0 < 1) and
    # among equal-ts references the larger id comes last, so a plain
    # ignore-nulls `last` carry-forward realizes the tie policy.
    w = (Window.partitionBy(key_col)
         .orderBy("tus", "_side", F.coalesce("_rid", F.lit(-1)))
         .rowsBetween(Window.unboundedPreceding, 0))
    # ONE carried struct, not two independent last() windows: with
    # separate windows a matched right row whose VALUE is NULL would be
    # skipped by the value carry but not the timestamp carry, pairing
    # the latest ts with a STALE value from an earlier row. The struct
    # is non-null whenever the right ROW exists, so ts and value always
    # come from the same (latest) row — a NULL observation surfaces as
    # (its ts, NULL), the correct as-of answer.
    carried = u.withColumn(
        "_asof",
        F.last(F.when(F.col("_side") == 0,
                      F.struct(F.col("tus").alias("ts"),
                               F.col("_rval").alias("val"))),
               ignorenulls=True).over(w))
    return (carried.where(F.col("_side") == 1)
            .select(key_col, "probe_id",
                    F.col("tus").alias("probe_ts_us"),
                    F.col("_asof.ts").alias("asof_ts_us"),
                    F.round(F.col("_asof.val"), 6).alias("asof_value"),
                    (F.col("tus") - F.col("_asof.ts")).alias("lag_us")))


def rolling_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", value_col: str = "value",
                  id_col: str = "event_id",
                  window_minutes: int = 60) -> DataFrame:
    """Trailing range-frame rolling statistics: per key, for every
    event, the count/sum/mean of `value` over the INCLUSIVE trailing
    `window_minutes` wall-clock window ending at that event (the
    standard "activity in the last hour" feature).

    A RANGE frame (not ROWS): ties on the timestamp are frame peers in
    every engine, so the result is deterministic under duplicate
    timestamps. One shuffle on the key; within a key partition Spark
    evaluates the moving frame with two pointers over the sorted run —
    O(rows + frame moves), no per-row rescan. Hot-key skew carries the
    same caveat as `sessionize` (a key's rows must fit one partition's
    sort spill budget — millions of rows per user spill fine; salting
    is only needed if one key dominates the corpus).
    """
    win_us = window_minutes * 60_000_000
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(key_col), F.col(id_col),
        tus.alias("tus"), F.col(value_col).alias("_v"))
    w = (Window.partitionBy(key_col).orderBy("tus")
         .rangeBetween(-win_us, 0))
    return base.select(
        key_col, id_col,
        F.col("tus").alias("ts_us"),
        F.count("_v").over(w).alias("n_window"),
        F.round(F.sum("_v").over(w), 6).alias("sum_window"),
        F.round(F.avg("_v").over(w), 6).alias("mean_window"))


def funnel_steps(events: DataFrame, steps: list[str],
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered conversion funnel: for each key, the earliest time it
    completed step i AFTER its step-(i-1) completion (strictly
    increasing timestamps through the sequence).

    The classic product-analytics query. Relational shape: one
    conditional min-aggregate per step, each chained to the previous
    step's per-key table by an equi-join ON THE SAME KEY — every join
    and aggregate shuffles on `key_col` alone, so the whole funnel is
    co-partitioned after the first exchange (and the per-key table
    shrinks monotonically as the funnel narrows; AQE broadcasts the
    tail stages when they fit). No window over the raw event stream,
    no per-key event sorting.

    Returns one row per key with `ts_1..ts_k` (NULL once the key
    drops out) — aggregate upstream for step-conversion counts.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (events.where(F.col(type_col) == steps[0])
           .groupBy(key_col).agg(F.min(ts_col).alias("ts_1")))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (events.where(F.col(type_col) == step)
               .join(cur.select(key_col, f"ts_{i - 1}"), key_col)
               .where(F.col(ts_col) > F.col(f"ts_{i - 1}"))
               .groupBy(key_col).agg(F.min(ts_col).alias(f"ts_{i}")))
        cur = cur.join(nxt, key_col, "left")
    return cur


def cohort_retention(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: keys are cohorted by the ISO week of
    their first event; a key is retained in week offset w if it has
    any event in [first + 7w days, first + 7(w+1) days).

    Two key-keyed hash aggregates and one co-partitioned join: the
    per-key first-event table (one shuffle on the key, map-side
    combinable min) joins back to the stream on the same key, the
    (cohort, offset, key) distinct collapses duplicates BEFORE the
    count — at 100 TB the distinct is the shuffle that matters and it
    is bounded by keys x active-weeks, not events. Retention fraction
    is against the week-0 cohort size (every key has an event at
    offset 0 by construction).

    Returns (cohort_week date, week_offset, n_active, retention).
    """
    first = events.groupBy(key_col).agg(F.min(ts_col).alias("_first"))
    active = (events.join(first, key_col)
              .select(
                  F.date_trunc("week", F.col("_first")).cast("date")
                  .alias("cohort_week"),
                  F.floor(F.datediff(F.col(ts_col).cast("date"),
                                     F.col("_first").cast("date")) / 7)
                  .cast("long").alias("week_offset"),
                  F.col(key_col))
              .distinct())
    counts = active.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct(key_col).alias("n_active"))
    base = (counts.where(F.col("week_offset") == 0)
            .select("cohort_week", F.col("n_active").alias("_cohort_n")))
    return (counts.join(F.broadcast(base), "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    F.round(F.col("n_active")
                            / F.col("_cohort_n").cast("double"), 6)
                    .alias("retention")))


def anomaly_days(events: DataFrame, key_col: str = "event_type",
                 ts_col: str = "ts", trailing_days: int = 28,
                 z: int = 3, min_baseline: int = 14,
                 top_k: int | None = None) -> DataFrame:
    """Daily-volume anomaly detector: flag (key, day) cells whose event
    count sits more than `z` standard deviations above/below the mean
    of the TRAILING `trailing_days` days — the monitoring gate for
    "did this source's ingest volume spike or collapse today".

    The corpus collapses to daily counts first (one shuffle, output
    bounded by keys × days), so the trailing window runs over the
    bounded count table, never raw events. The z-test is EXACT integer
    arithmetic — (x·n − S)² > z²·(n·Q − S²) is the cross-multiplied
    form of ((x−μ)/σ)² > z² with μ=S/n, σ²=(nQ−S²)/n² — in
    decimal(38,0) so no float mean/stddev crosses engines and no sqrt
    is needed. Frames shorter than `min_baseline` days are warm-up and
    never flag. Window partitions per key; at very long horizons
    partition additionally by year.

    With `top_k` set, the threshold is replaced by a ranking: the k
    most anomalous eligible cells by z² (the two exact integers meet
    in ONE IEEE division, identical on both engines; deterministic
    (key, day) tie-break; TakeOrderedAndProject, no global sort).
    Zero-variance baselines are excluded in ranked mode.

    Returns flagged rows (key, day, n_events, n_baseline, base_sum),
    plus z2 in ranked mode.
    """
    daily = (events
             .select(F.col(key_col),
                     F.datediff(F.col(ts_col).cast("date"),
                                F.lit("1970-01-01").cast("date"))
                     .cast("long").alias("_epoch_day"))
             .groupBy(key_col, "_epoch_day")
             .agg(F.count("*").alias("n_events")))
    w = (Window.partitionBy(key_col).orderBy("_epoch_day")
         .rangeBetween(-trailing_days, -1))
    d = (daily
         .withColumn("_n", F.count("n_events").over(w))
         .withColumn("_s", F.sum("n_events").over(w))
         .withColumn("_q", F.sum(F.col("n_events") * F.col("n_events"))
                     .over(w)))
    big = lambda c: c.cast("decimal(38,0)")
    x, n, s, q = (F.col("n_events"), F.col("_n"), F.col("_s"), F.col("_q"))
    dev2 = (big(x) * n - big(s)) * (big(x) * n - big(s))
    var_n = big(n) * q - big(s) * s
    day = F.date_add(F.lit("1970-01-01").cast("date"),
                     F.col("_epoch_day").cast("int")).alias("day")
    base_cols = [F.col(key_col), day, F.col("n_events"),
                 n.alias("n_baseline"), s.alias("base_sum")]
    if top_k is None:
        rhs = F.lit(z * z) * var_n
        return d.where((n >= min_baseline) & (dev2 > rhs)) \
            .select(*base_cols)
    z2 = F.round(dev2.cast("double") / var_n.cast("double"), 6)
    return (d.where((n >= min_baseline) & (var_n > 0))
            .select(*base_cols, z2.alias("z2"))
            .orderBy(F.desc("z2"), F.asc(key_col), F.asc("day"))
            .limit(top_k))


def trend_slope(events: DataFrame, key_col: str = "event_type",
                ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Per-key OLS trend of value over time — closed-form regression
    from five map-side-combinable moment sums (n, Σt, Σv, Σtv, Σt²,
    Σv²), every sum an exact integer (t = epoch day, v fixed-pointed
    to 1e-6), so the slope and Pearson r come out of a handful of
    deterministic IEEE ops on identical operands. ONE aggregation over
    the fact — the grouped-regression shape that needs no window, no
    sort, no second pass at any scale.

    Returns (key, n_events, slope_per_day, pearson_r)."""
    t = F.datediff(F.col(ts_col).cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
    v = F.round(F.col(value_col) * 1e6).cast("long")
    big = lambda c: c.cast("decimal(38,0)")
    g = (events.select(key_col, t.alias("_t"), v.alias("_v"))
         .groupBy(key_col)
         .agg(F.count("*").alias("_n"),
              F.sum(big(F.col("_t"))).alias("_st"),
              F.sum(big(F.col("_v"))).alias("_sv"),
              F.sum(big(F.col("_t")) * F.col("_v")).alias("_stv"),
              F.sum(big(F.col("_t")) * F.col("_t")).alias("_stt"),
              F.sum(big(F.col("_v")) * F.col("_v")).alias("_svv")))
    num = (big(F.col("_n")) * F.col("_stv")
           - F.col("_st") * F.col("_sv")).cast("double")
    dent = (big(F.col("_n")) * F.col("_stt")
            - F.col("_st") * F.col("_st")).cast("double")
    denv = (big(F.col("_n")) * F.col("_svv")
            - F.col("_sv") * F.col("_sv")).cast("double")
    # ANSI Spark raises DIVIDE_BY_ZERO even for doubles: a group with
    # zero time- or value-variance (single day / constant value) must
    # short-circuit to NULL, not error the whole job
    return g.select(
        F.col(key_col), F.col("_n").alias("n_events"),
        F.when(dent > 0, F.round(num / dent / 1e6, 8))
        .alias("slope_per_day"),
        F.when(dent * denv > 0, F.round(num / F.sqrt(dent * denv), 6))
        .alias("pearson_r"))
