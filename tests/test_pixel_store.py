"""Storage-layout tests: tile partition pruning and the shuffle-free
bucketed pair join (the 100TB-scale claims, asserted on the plan)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from error_analysis_spark.fixtures import make_dem_fixture
from error_analysis_spark.sources import pixel_store as PS


@pytest.fixture(scope="module")
def fx():
    return make_dem_fixture(n_rows=128, n_cols=128, seed=31)


def test_partition_pruning(spark, fx, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("px") / "pixels")
    PS.write_pixels(spark.createDataFrame(fx.pixels), path, tile=64)
    df = PS.read_pixels(spark, path, "reference_dem")
    pruned = PS.prune_to_bbox(df, 0, 63, 0, 63, tile=64)
    # correct result
    n = pruned.count()
    sub = fx.pixels[(fx.pixels.dataset_id == "reference_dem")
                    & (fx.pixels.row < 64) & (fx.pixels.col < 64)]
    assert n == len(sub)
    # plan reads only the matching tile partition (1 of 4 per dataset)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "ty" in plan


def test_bucketed_join_has_no_exchange(spark, fx):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("ref_px", "cmp_px"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    px = spark.createDataFrame(fx.pixels)
    valid = px.where(F.col("value").isNotNull())
    PS.save_bucketed(valid.where(F.col("dataset_id") == "reference_dem"),
                     "ref_px", n_buckets=8, tile=64)
    PS.save_bucketed(valid.where(F.col("dataset_id") == "compare_dem"),
                     "cmp_px", n_buckets=8, tile=64)
    a = PS.read_bucketed(spark, "ref_px").select("row", "col", "value")
    b = PS.read_bucketed(spark, "cmp_px").select(
        "row", "col", F.col("value").alias("value_b"))
    joined = a.join(b, ["row", "col"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # the whole point of bucketing
    # and the join is still correct
    expected = int((~fx.truth["mask_ref"] & ~fx.truth["mask_cmp"]).sum())
    assert joined.count() == expected
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_point_sink_roundtrip_and_bbox_prune(spark, tmp_path_factory):
    import pandas as pd

    path = str(tmp_path_factory.mktemp("pts") / "cloud.parquet")
    pdf = pd.DataFrame({
        "x": [10.0, 1030.0, 2050.0, 10.5],
        "y": [5.0, 1500.0, 300.0, 6.5],
        "z": [1.0, 2.0, 3.0, 4.0],
        "classification": [2, 7, 2, 2],
        "gps_time": [1e9, 1e9 + 1, 1e9 + 2, 1e9 + 3],
    })
    PS.write_points(spark.createDataFrame(pdf), path)
    back = PS.read_points(spark, path)
    assert back.count() == 4
    got = {(r["x"], r["z"]) for r in back.collect()}
    assert got == set(zip(pdf["x"], pdf["z"]))
    # bbox read prunes to the matching spatial tile only
    win = PS.read_points(spark, path, bbox=(0.0, 0.0, 100.0, 100.0))
    assert {r["z"] for r in win.collect()} == {1.0, 4.0}
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan or "PartitionFilters" in plan


def test_catalog_json_sink_roundtrip(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cat") / "catalog.json")
    cat = spark.createDataFrame(
        [("d1", "usgs", "2020-01-01"), ("d2", "noaa", "2021-06-15")],
        ["identifier", "source", "start_date"])
    PS.write_catalog_json(cat, path)
    back = spark.read.json(path)
    assert back.count() == 2
    assert {r["identifier"] for r in back.collect()} == {"d1", "d2"}
