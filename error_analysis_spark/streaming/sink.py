"""Idempotent foreachBatch sink — the exactly-once pattern for
streaming writes to a keyed snapshot table.

Structured Streaming guarantees at-least-once delivery to a
`foreachBatch` function: after a crash between "sink write" and
"checkpoint commit", the SAME (batch_id, data) pair is replayed. The
standard fix is to make the sink an idempotent keyed upsert and to
record the batch id transactionally with the data:

- each micro-batch MERGEs into the snapshot by key (last-write-wins via
  `curation.merge_upsert`), so re-applying a batch reproduces the same
  snapshot byte-for-byte;
- the applied batch id is stored IN the snapshot directory (a 1-row
  `_applied` parquet written after the data in the same job), so a
  replayed batch id is detected and skipped without rereading state.

The snapshot lives as two parquet generations (ping-pong A/B dirs)
because overwriting the directory being read is not atomic on plain
object storage; the `_applied` marker names the live generation. On a
real deployment you would swap this layer for Delta/Iceberg MERGE —
the relational core (the keyed merge) is exactly the same operator.

The test replays a batch (same batch_id, same rows) and checks the
snapshot is unchanged — the idempotence contract — then applies a new
batch and checks the merge semantics carried through.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from error_analysis_spark.extensions.curation import merge_upsert

_PAYLOAD = ("text", "lang", "source", "n_chars")


def _marker_path(snap_dir: str) -> str:
    return os.path.join(snap_dir, "_applied")


def _live(spark: SparkSession, snap_dir: str):
    """Return (generation_name, last_batch_id) or (None, None)."""
    try:
        row = spark.read.parquet(_marker_path(snap_dir)).collect()[0]
        return row["gen"], row["batch_id"]
    except Exception:
        return None, None


def read_snapshot(spark: SparkSession, snap_dir: str) -> DataFrame | None:
    gen, _ = _live(spark, snap_dir)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(snap_dir, gen))


def apply_batch(spark: SparkSession, snap_dir: str,
                batch_df: DataFrame, batch_id: int) -> bool:
    """The foreachBatch body: idempotent keyed upsert of one
    micro-batch into the snapshot. Returns False when the batch id was
    already applied (replay detected — skipped)."""
    gen, last = _live(spark, snap_dir)
    if last is not None and batch_id <= last:
        return False
    target = read_snapshot(spark, snap_dir)
    if target is None:
        merged = (batch_df.where(F.col("_op") != "delete")
                  .select("doc_id", *_PAYLOAD))
    else:
        merged = merge_upsert(target, batch_df,
                              payload_cols=_PAYLOAD).drop("_action")
    nxt = "gen_b" if gen == "gen_a" else "gen_a"
    merged.write.mode("overwrite") \
        .parquet(os.path.join(snap_dir, nxt))
    (spark.createDataFrame([(nxt, batch_id)], "gen string, batch_id long")
     .coalesce(1).write.mode("overwrite").parquet(_marker_path(snap_dir)))
    return True


def upsert_sink(snap_dir: str):
    """Wrap `apply_batch` as a writeStream.foreachBatch callable."""
    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch(batch_df.sparkSession, snap_dir, batch_df, batch_id)
    return _sink
