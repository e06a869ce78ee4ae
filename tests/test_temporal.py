"""Temporal operators (operators/temporal.py): gap sessions + as-of
join. Oracle parity for the driver queries runs in test_oracle.py;
these pin the session/tie semantics and the streaming equivalence."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.operators import temporal as TP
from error_analysis_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, SF_DIR, "events").cache()


def test_sessionize_invariants(spark, events):
    gap_us = 30 * 60_000_000
    out = TP.sessionize(events, gap_minutes=30).toPandas()
    assert out["n_events"].sum() == events.count()
    # per user: sessions are disjoint and separated by >= gap
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start_us")
        starts = g["session_start_us"].tolist()
        ends = g["session_end_us"].tolist()
        for s, e in zip(starts, ends):
            assert e >= s + gap_us  # end = last event + gap
        for nxt, prev_end in zip(starts[1:], ends[:-1]):
            assert nxt >= prev_end  # next session starts after close


def test_sessionize_gap_boundary(spark):
    """An event exactly `gap` after the previous one still MERGES
    (Spark merges touching session ranges; only a strictly larger gap
    opens a new session — the oracle uses `diff > gap` to match).
    One microsecond past the gap opens a new session."""
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(1, t0, 7, "view", 1.0),
            (2, t0 + dt.timedelta(minutes=30), 7, "view", 1.0),
            (3, t0 + dt.timedelta(minutes=60, microseconds=1),
             7, "view", 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    out = TP.sessionize(df, gap_minutes=30).toPandas() \
        .sort_values("session_start_us")
    assert len(out) == 2
    assert out["n_events"].tolist() == [2, 1]


def test_asof_matches_bruteforce(spark, events):
    purchases = events.where(F.col("event_type") == "purchase")
    views = events.where(F.col("event_type") == "view")
    got = TP.asof_join(purchases, views, "user_id", "ts", "event_id",
                       "value").toPandas().set_index("probe_id")
    vp = views.select("user_id", F.unix_micros(
        F.col("ts").cast("timestamp")).alias("tus"), "event_id",
        "value").toPandas()
    pp = purchases.select("user_id", F.unix_micros(
        F.col("ts").cast("timestamp")).alias("tus"),
        "event_id").toPandas()
    by_user = {u: g.sort_values(["tus", "event_id"])
               for u, g in vp.groupby("user_id")}
    n_null = 0
    for r in pp.itertuples():
        g = by_user.get(r.user_id)
        cand = g[g["tus"] <= r.tus] if g is not None else None
        row = got.loc[r.event_id]
        if cand is None or len(cand) == 0:
            assert pd.isna(row["asof_ts_us"])
            n_null += 1
        else:
            best = cand.iloc[-1]
            assert row["asof_ts_us"] == best["tus"]
            assert row["lag_us"] == r.tus - best["tus"]
    assert len(got) == len(pp)


def test_sessionize_stream_matches_batch(spark, tmp_path_factory):
    """Streaming session_window with a watermark: once a far-future
    sentinel advances the watermark, append mode must have emitted
    exactly the batch sessions of the real events."""
    from error_analysis_spark.streaming import windows as SW

    d = tmp_path_factory.mktemp("sessstream")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    real = []
    eid = 0
    for u in (1, 2, 3):
        for burst in range(3):
            base = t0 + dt.timedelta(hours=burst * 2, minutes=7 * u)
            for k in range(4):
                eid += 1
                real.append((eid, base + dt.timedelta(minutes=5 * k),
                             u, "view", float(u * 10 + k)))
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double")
    # arrivals must be (roughly) time-ordered or the watermark advanced
    # by one file legitimately drops another file's older sessions as
    # late data — so slice chronologically, not by user. The watermark
    # only advances AFTER a batch commits, so the flush of the last
    # real file needs one more batch behind it: two sentinel files,
    # each later than everything before it.
    real.sort(key=lambda r: r[1])
    chunks = [real[:12], real[12:24], real[24:],
              [(9999, t0 + dt.timedelta(days=30), 999, "view", 0.0)],
              [(9998, t0 + dt.timedelta(days=60), 998, "view", 0.0)]]
    import glob
    import shutil
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.parquet(str(d / f"b{i}"), mode="overwrite")
        part = glob.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        shutil.copy(part, str(d / f"arrival_{i}.parquet"))
        shutil.rmtree(str(d / f"b{i}"))

    stream = SW.stream_events(spark, str(d), max_files_per_trigger=1)
    sess = SW.sessionized_stream(stream, gap_minutes=30,
                                 watermark="1 hour")
    q = (sess.writeStream.outputMode("append")
         .format("memory").queryName("sess_out").start())
    q.processAllAvailable()
    q.stop()
    got = spark.table("sess_out").toPandas()
    got = got[~got["user_id"].isin([998, 999])].sort_values(
        ["user_id", "session_start_us"]).reset_index(drop=True)

    batch = TP.sessionize(
        spark.createDataFrame(real, schema), gap_minutes=30).toPandas() \
        .sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch, check_dtype=False)


def test_asof_join_null_right_value_stays_with_its_row(spark):
    """A right row with a NULL value is still the as-of MATCH when it is
    the latest at-or-before row: the probe must get (its ts, NULL), not
    the latest ts paired with a STALE earlier value (the two-window
    desync bug)."""
    import datetime as dt

    import pandas as pd

    from error_analysis_spark.operators import temporal as TP
    t0 = dt.datetime(2026, 1, 1)
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["a", "a"], "event_id": [1, 2],
        "ts": [t0, t0 + dt.timedelta(seconds=10)],
        "value": [3.0, None]}))
    left = spark.createDataFrame(pd.DataFrame({
        "k": ["a"], "event_id": [100],
        "ts": [t0 + dt.timedelta(seconds=12)], "value": [0.0]}))
    out = TP.asof_join(left, right, "k", "ts", "event_id",
                       "value").collect()[0]
    assert out["asof_ts_us"] == int((t0 + dt.timedelta(seconds=10))
                                    .timestamp() * 1e6)
    assert out["asof_value"] is None  # NOT the stale 3.0
    assert out["lag_us"] == 2_000_000
