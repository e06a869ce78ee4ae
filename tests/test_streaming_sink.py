"""Idempotent foreachBatch upsert sink: replaying a batch id leaves the
snapshot byte-identical (the at-least-once → exactly-once contract),
and merge semantics (update/insert/delete) carry through batches. Also
drives the sink through a real writeStream.foreachBatch run."""

from __future__ import annotations

import pandas as pd

from error_analysis_spark.streaming import sink as SK


def _batch(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source",
                                    "n_chars", "_op"]))


def _snap(spark, d):
    df = SK.read_snapshot(spark, str(d))
    return sorted((r["doc_id"], r["text"]) for r in df.collect())


def test_replay_is_idempotent_and_merge_applies(spark, tmp_path):
    d = tmp_path / "snap"
    b0 = _batch(spark, [(1, "a", "en", "s", 1, "upsert"),
                        (2, "b", "en", "s", 1, "upsert")])
    assert SK.apply_batch(spark, str(d), b0, batch_id=0) is True
    assert _snap(spark, d) == [(1, "a"), (2, "b")]

    # replay of batch 0 (same id): must be skipped, snapshot unchanged
    b0_replay = _batch(spark, [(1, "CORRUPT", "en", "s", 1, "upsert")])
    assert SK.apply_batch(spark, str(d), b0_replay, batch_id=0) is False
    assert _snap(spark, d) == [(1, "a"), (2, "b")]

    # batch 1: update 1, delete 2, insert 3
    b1 = _batch(spark, [(1, "A2", "en", "s", 1, "upsert"),
                        (2, None, None, None, None, "delete"),
                        (3, "c", "fr", "s", 1, "upsert")])
    assert SK.apply_batch(spark, str(d), b1, batch_id=1) is True
    assert _snap(spark, d) == [(1, "A2"), (3, "c")]

    # re-applying batch 1 after "recovery": still idempotent
    assert SK.apply_batch(spark, str(d), b1, batch_id=1) is False
    assert _snap(spark, d) == [(1, "A2"), (3, "c")]


def test_foreachbatch_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    snap = tmp_path / "snap2"
    pdf = pd.DataFrame(
        [(i, f"t{i}", "en", "s", 1, "upsert") for i in range(6)],
        columns=["doc_id", "text", "lang", "source", "n_chars", "_op"])
    spark.createDataFrame(pdf).repartition(3) \
        .write.mode("overwrite").parquet(str(src / "in"))
    stream = (spark.readStream
              .schema("doc_id bigint, text string, lang string, "
                      "source string, n_chars bigint, _op string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "in")))
    q = (stream.writeStream
         .foreachBatch(SK.upsert_sink(str(snap)))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    assert _snap(spark, snap) == [(i, f"t{i}") for i in range(6)]


def test_duplicate_keys_within_batch_resolve_deterministically(spark,
                                                               tmp_path):
    d = tmp_path / "snap3"
    b0 = _batch(spark, [(1, "a", "en", "s", 1, "upsert")])
    SK.apply_batch(spark, str(d), b0, batch_id=0)
    # one batch carries two upserts AND a delete for key 1, plus two
    # upserts for key 2: delete wins key 1; key 2 keeps the
    # lexicographically-max payload — and the snapshot keeps its
    # one-row-per-key invariant (the raw batch would fan out the merge)
    b1 = _batch(spark, [(1, "x", "en", "s", 1, "upsert"),
                        (1, None, None, None, None, "delete"),
                        (1, "y", "en", "s", 1, "upsert"),
                        (2, "p", "en", "s", 1, "upsert"),
                        (2, "q", "en", "s", 1, "upsert")])
    SK.apply_batch(spark, str(d), b1, batch_id=1)
    assert _snap(spark, d) == [(2, "q")]


def test_marker_log_is_compacted(spark, tmp_path):
    import os
    d = tmp_path / "snap4"
    for b in range(SK._MARKER_KEEP + 5):
        SK.apply_batch(spark, str(d),
                       _batch(spark, [(b, f"t{b}", "en", "s", 1,
                                       "upsert")]), batch_id=b)
    mdir = SK._markers_dir(str(d))
    names = sorted(os.listdir(mdir))
    assert len(names) == SK._MARKER_KEEP, names
    # the newest marker survives and recovery still reads it
    assert names[-1] == f"b{SK._MARKER_KEEP + 4:020d}"
    gen, last = SK._live(spark, str(d))
    assert last == SK._MARKER_KEEP + 4
    # replay detection still works after compaction
    assert SK.apply_batch(spark, str(d),
                          _batch(spark, [(0, "X", "en", "s", 1,
                                          "upsert")]), batch_id=3) is False
    assert len(_snap(spark, d)) == SK._MARKER_KEEP + 5
