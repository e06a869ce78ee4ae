"""Incremental differencing over streaming survey ingest.

The reference is batch-only (SURVEY §2.9) — this module is the natural
Spark extension: as new compare-survey pixel tiles land (files in a
directory, or any Structured Streaming source), the DoD and its zonal
statistics update incrementally instead of recomputing the full pair.

Design (idiomatic Structured Streaming):
- the reference DEM is a STATIC bucketed pixel table; each micro-batch
  of compare pixels stream-static joins against it on (row, col) — no
  state store involvement, the join is per-batch;
- zonal running stats are a streaming groupBy aggregation in *update*
  mode over (sum, sum², count) — the associative form of mean/std/rms,
  so partial states merge exactly across micro-batches;
- `foreachBatch` is reserved for sink-side upserts (parquet/Delta);
  the test drives the memory sink.

At scale: one micro-batch ≈ one survey tile delivery; maxFilesPerTrigger
bounds batch size; the stream-static join broadcasts nothing and prunes
reference tiles via the same (row, col) bucketing as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PIXEL_SCHEMA = ("dataset_id string, band int, row int, col int, "
                "x double, y double, value double")


def stream_pixels(spark, path: str, max_files_per_trigger: int = 1):
    """File-source pixel stream: each arriving parquet file is one
    micro-batch of survey pixels."""
    return (spark.readStream
            .schema(PIXEL_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def incremental_dod(compare_stream: DataFrame,
                    reference: DataFrame) -> DataFrame:
    """Stream-static J1/R4: per-batch equi-join against the static
    reference, Δz = compare − reference on co-valid pixels."""
    from error_analysis_spark.operators.align import _valid
    ref = (reference.where(_valid())
           .select("row", "col", F.col("value").alias("ref_value")))
    return (compare_stream.where(_valid())
            .join(ref, ["row", "col"])
            .withColumn("dz", F.col("value") - F.col("ref_value")))


def running_zonal_stats(dod_stream: DataFrame,
                        membership: DataFrame) -> DataFrame:
    """Streaming A2: running (n, mean, std, rms) per zone in update mode.

    Uses the merge-exact moment form (Σ, Σ², n) so the state per zone is
    three numbers — bounded state, no watermark needed (zones are a
    small fixed key set)."""
    member = membership.select("row", "col", "zone_id")
    return (
        dod_stream.join(member, ["row", "col"])
        .groupBy("zone_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("dz").alias("sum_dz"),
            F.sum(F.col("dz") * F.col("dz")).alias("sum_dz2"),
        )
        .select(
            "zone_id", "n",
            (F.col("sum_dz") / F.col("n")).alias("mean_dz"),
            # clamp float cancellation: constant-dz zones give
            # s2/n − mean² ≈ −1e-18, and sqrt(negative) = NaN (the
            # stateful twin at stateful_zone_stats clamps identically)
            F.sqrt(F.greatest(
                F.col("sum_dz2") / F.col("n")
                - (F.col("sum_dz") / F.col("n")) ** 2,
                F.lit(0.0))).alias("std_dz"),
            F.sqrt(F.col("sum_dz2") / F.col("n")).alias("rms_dz"),
        )
    )


def stateful_zone_stats(dod_stream: DataFrame, membership: DataFrame):
    """Custom stateful operator (`applyInPandasWithState`): per-zone
    running moments kept in an explicit GroupState instead of the SQL
    aggregation state store.

    Why you'd pick this over `running_zonal_stats`: the state is YOUR
    struct — it can carry things SQL aggregation state can't (e.g. a
    reservoir sample per zone, or the per-zone t-digest a streaming
    median needs), and emission policy is code, not output mode. Here it
    carries (n, Σ, Σ²) and emits one updated row per zone per batch —
    semantically identical to the SQL form, so the test cross-checks the
    two paths against each other.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("zone_id string, n long, mean_dz double, std_dz double, "
                  "rms_dz double")
    state_schema = "n long, s double, s2 double"

    def update(key, pdfs, state: GroupState):
        n, s, s2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            dz = pdf["dz"].to_numpy()
            n += len(dz)
            s += float(dz.sum())
            s2 += float((dz * dz).sum())
        state.update((n, s, s2))
        if n:
            mean = s / n
            var = max(s2 / n - mean * mean, 0.0)
            yield pd.DataFrame({
                "zone_id": [key[0]], "n": [n], "mean_dz": [mean],
                "std_dz": [var ** 0.5], "rms_dz": [(s2 / n) ** 0.5],
            })

    joined = dod_stream.join(
        membership.select("row", "col", "zone_id"), ["row", "col"])
    return (joined.groupBy("zone_id")
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update", GroupStateTimeout.NoTimeout))


def run_to_memory(result_stream: DataFrame, table: str):
    """Drive the stream into an in-memory sink (tests/demos); callers on
    a cluster swap this for foreachBatch-upsert into parquet/Delta."""
    return (result_stream.writeStream
            .outputMode("complete")
            .format("memory")
            .queryName(table)
            .start())
