"""Idempotent foreachBatch sink — the exactly-once pattern for
streaming writes to a keyed snapshot table.

Structured Streaming guarantees at-least-once delivery to a
`foreachBatch` function: after a crash between "sink write" and
"checkpoint commit", the SAME (batch_id, data) pair is replayed. The
standard fix is to make the sink an idempotent keyed upsert and to
record the batch id durably WITH the data:

- each micro-batch MERGEs into the snapshot by key (last-write-wins via
  `curation.merge_upsert`, after a deterministic per-key pre-dedup of
  the batch — see `_dedup_batch`), so re-applying a batch reproduces
  the same snapshot byte-for-byte;
- applied batch ids are APPEND-ONLY markers (one parquet dir per batch
  under `markers/`, never overwritten): a crash mid-marker-write
  leaves the previous marker intact, so recovery re-applies the batch
  instead of ever losing the snapshot. Only markers whose `_SUCCESS`
  file exists count; a torn marker write is invisible. After each
  committed write the sink COMPACTS the marker log — the newest
  `_MARKER_KEEP` committed markers are retained, older ones deleted —
  so a long-running stream's marker listing (one driver-side listdir +
  1-row parquet read per batch) stays O(K), not O(batches). Recovery
  only ever reads the newest committed marker, so retention ≥ 1 is
  safe; K > 1 just keeps an audit tail.
- data generations ping-pong between two dirs (`gen_a`/`gen_b`): the
  write always targets the NON-live generation, so the live snapshot
  is never the directory being overwritten.

On a real deployment you would swap this layer for Delta/Iceberg MERGE
— the relational core (the keyed merge) is exactly the same operator.
The marker listing uses the local filesystem (os.listdir); an object-
store deployment swaps in its FS client listing.

The tests replay a batch (same batch_id) and check the snapshot is
unchanged — the idempotence contract — then apply a new batch and
check the merge semantics carried through.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.extensions.curation import merge_upsert

_PAYLOAD = ("text", "lang", "source", "n_chars")

# committed markers retained after each batch (newest-first); older
# markers are audit history only — recovery reads just the newest
_MARKER_KEEP = 8


def _markers_dir(snap_dir: str) -> str:
    return os.path.join(snap_dir, "markers")


def _live(spark: SparkSession, snap_dir: str):
    """(generation_name, last_batch_id) from the newest COMMITTED
    marker, or (None, None) for a fresh snapshot. Markers are
    append-only; only dirs with a _SUCCESS file count."""
    mdir = _markers_dir(snap_dir)
    if not os.path.isdir(mdir):
        return None, None
    committed = sorted(
        d for d in os.listdir(mdir)
        if os.path.exists(os.path.join(mdir, d, "_SUCCESS")))
    if not committed:
        return None, None
    row = spark.read.parquet(os.path.join(mdir, committed[-1])) \
        .collect()[0]
    return row["gen"], row["batch_id"]


def read_snapshot(spark: SparkSession, snap_dir: str,
                  gen: str | None = None) -> DataFrame | None:
    """Load the live generation (pass `gen` to skip a marker read)."""
    if gen is None:
        gen, _ = _live(spark, snap_dir)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(snap_dir, gen))


def _dedup_batch(batch_df: DataFrame) -> DataFrame:
    """Deterministic per-key reduction of one micro-batch: a delete
    anywhere in the batch wins the key; among multiple upserts the
    lexicographically-max payload wins. File-source micro-batches
    carry no intra-batch order, so a deterministic policy (stable
    under replay and partitioning) is the honest contract — sources
    that DO have an event order should sort upstream into one row per
    key per batch."""
    pri = F.when(F.col("_op") == "delete", 1).otherwise(0)
    pick = F.max(F.struct(
        pri.alias("p"),
        *[F.col(c).alias(c) for c in _PAYLOAD],
        F.col("_op").alias("op"))).alias("_m")
    return (batch_df.groupBy("doc_id").agg(pick)
            .select("doc_id",
                    *[F.col(f"_m.{c}").alias(c) for c in _PAYLOAD],
                    F.col("_m.op").alias("_op")))


def apply_batch(spark: SparkSession, snap_dir: str,
                batch_df: DataFrame, batch_id: int) -> bool:
    """The foreachBatch body: idempotent keyed upsert of one
    micro-batch into the snapshot. Returns False when the batch id was
    already applied (replay detected — skipped)."""
    gen, last = _live(spark, snap_dir)
    if last is not None and batch_id <= last:
        return False
    batch = _dedup_batch(batch_df)
    target = read_snapshot(spark, snap_dir, gen=gen)
    if target is None:
        merged = (batch.where(F.col("_op") != "delete")
                  .select("doc_id", *_PAYLOAD))
    else:
        merged = merge_upsert(target, batch,
                              payload_cols=_PAYLOAD).drop("_action")
    nxt = "gen_b" if gen == "gen_a" else "gen_a"
    merged.write.mode("overwrite") \
        .parquet(os.path.join(snap_dir, nxt))
    (spark.createDataFrame([(nxt, batch_id)], "gen string, batch_id long")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(_markers_dir(snap_dir), f"b{batch_id:020d}")))
    _compact_markers(snap_dir)
    return True


def _compact_markers(snap_dir: str, keep: int = _MARKER_KEEP) -> None:
    """Delete committed markers older than the newest `keep` — bounds
    the marker log over a long-running stream. Uncommitted (torn) dirs
    older than the newest committed marker are dead and removed too;
    anything at or past it is left alone (it may be mid-write)."""
    import shutil
    mdir = _markers_dir(snap_dir)
    if not os.path.isdir(mdir):
        return
    names = sorted(os.listdir(mdir))
    committed = [d for d in names
                 if os.path.exists(os.path.join(mdir, d, "_SUCCESS"))]
    if not committed:
        return
    cutoff = committed[-keep] if len(committed) > keep else committed[0]
    for d in names:
        if d < cutoff or (d < committed[-1] and d not in committed):
            shutil.rmtree(os.path.join(mdir, d), ignore_errors=True)


def upsert_sink(snap_dir: str):
    """Wrap `apply_batch` as a writeStream.foreachBatch callable."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df.sparkSession, snap_dir, batch_df, batch_id)
    return _sink
