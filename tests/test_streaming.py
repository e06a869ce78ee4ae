"""Streaming incremental-DoD tests: the micro-batched result must equal
the batch computation exactly (merge-exact moment aggregation)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.fixtures import make_dem_fixture
from error_analysis_spark.operators.zones import membership
from error_analysis_spark.streaming import incremental as INC


@pytest.fixture(scope="module")
def fx():
    return make_dem_fixture(n_rows=96, n_cols=96, seed=17)


def test_incremental_equals_batch(spark, fx, tmp_path_factory):
    stream_dir = tmp_path_factory.mktemp("stream")
    px = spark.createDataFrame(fx.pixels)
    ref = px.where(F.col("dataset_id") == "reference_dem").cache()
    cmp_ = px.where(F.col("dataset_id") == "compare_dem")

    # deliver the compare survey as 4 separate tile files (micro-batches)
    for i in range(4):
        chunk = cmp_.where(F.col("row") % 4 == i)
        chunk.coalesce(1).write.parquet(f"{stream_dir}/batch_{i}")
    # move part files up so the file source sees 4 arrivals
    import glob
    import shutil
    files = []
    for i in range(4):
        part = glob.glob(f"{stream_dir}/batch_{i}/part-*.parquet")[0]
        dst = f"{stream_dir}/survey_{i}.parquet"
        shutil.copy(part, dst)
        files.append(dst)
        shutil.rmtree(f"{stream_dir}/batch_{i}")

    zones = spark.createDataFrame(fx.zones)
    member = membership(
        px.select("row", "col", "x", "y").distinct(), zones).cache()

    stream = INC.stream_pixels(spark, str(stream_dir), max_files_per_trigger=1)
    dod = INC.incremental_dod(stream, ref)
    stats = INC.running_zonal_stats(dod, member)
    q = INC.run_to_memory(stats, "zonal_running")
    q.processAllAvailable()
    q.stop()
    got = spark.table("zonal_running").toPandas() \
        .sort_values("zone_id").reset_index(drop=True)

    # batch oracle over the same data
    dod_b = (cmp_.where(F.col("value").isNotNull())
             .join(ref.where(F.col("value").isNotNull())
                   .select("row", "col", F.col("value").alias("rv")),
                   ["row", "col"])
             .withColumn("dz", F.col("value") - F.col("rv")))
    want = (dod_b.join(member.select("row", "col", "zone_id"), ["row", "col"])
            .groupBy("zone_id")
            .agg(F.count("*").alias("n"),
                 F.avg("dz").alias("mean_dz"),
                 F.stddev_pop("dz").alias("std_dz"),
                 F.sqrt(F.avg(F.col("dz") ** 2)).alias("rms_dz"))
            .toPandas().sort_values("zone_id").reset_index(drop=True))
    assert list(got["zone_id"]) == list(want["zone_id"])
    np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    np.testing.assert_allclose(got["mean_dz"], want["mean_dz"], rtol=1e-9)
    np.testing.assert_allclose(got["std_dz"], want["std_dz"], rtol=1e-6)
    np.testing.assert_allclose(got["rms_dz"], want["rms_dz"], rtol=1e-9)
    # all three zones got updates (stream covered the full grid)
    assert len(got) == 3


def test_stateful_operator_matches_sql_path(spark, fx, tmp_path_factory):
    """applyInPandasWithState running stats ≡ the SQL streaming agg."""
    stream_dir = tmp_path_factory.mktemp("stream2")
    px = spark.createDataFrame(fx.pixels)
    ref = px.where(F.col("dataset_id") == "reference_dem").cache()
    cmp_ = px.where(F.col("dataset_id") == "compare_dem")
    import glob
    import shutil
    for i in range(3):
        chunk = cmp_.where(F.col("col") % 3 == i)
        chunk.coalesce(1).write.parquet(f"{stream_dir}/b{i}")
        part = glob.glob(f"{stream_dir}/b{i}/part-*.parquet")[0]
        shutil.copy(part, f"{stream_dir}/survey_{i}.parquet")
        shutil.rmtree(f"{stream_dir}/b{i}")

    zones = spark.createDataFrame(fx.zones)
    member = membership(
        px.select("row", "col", "x", "y").distinct(), zones).cache()

    stream = INC.stream_pixels(spark, str(stream_dir), max_files_per_trigger=1)
    dod = INC.incremental_dod(stream, ref)
    stats = INC.stateful_zone_stats(dod, member)
    q = (stats.writeStream.outputMode("update")
         .format("memory").queryName("zonal_stateful").start())
    q.processAllAvailable()
    q.stop()
    # update mode appends one row per zone per batch; the LAST row per
    # zone is the final running value
    got = (spark.table("zonal_stateful").toPandas()
           .groupby("zone_id").last().sort_index())

    dod_b = (cmp_.where(F.col("value").isNotNull())
             .join(ref.where(F.col("value").isNotNull())
                   .select("row", "col", F.col("value").alias("rv")),
                   ["row", "col"])
             .withColumn("dz", F.col("value") - F.col("rv")))
    want = (dod_b.join(member.select("row", "col", "zone_id"), ["row", "col"])
            .groupBy("zone_id")
            .agg(F.count("*").alias("n"), F.avg("dz").alias("mean_dz"),
                 F.sqrt(F.avg(F.col("dz") ** 2)).alias("rms_dz"))
            .toPandas().set_index("zone_id").sort_index())
    np.testing.assert_array_equal(got["n"].to_numpy(), want["n"].to_numpy())
    np.testing.assert_allclose(got["mean_dz"], want["mean_dz"], rtol=1e-9)
    np.testing.assert_allclose(got["rms_dz"], want["rms_dz"], rtol=1e-9)
