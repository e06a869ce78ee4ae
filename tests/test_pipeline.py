"""End-to-end `analyze_pair` test: the one-call restatement of the
reference notebook chain recovers the fixture's known truth."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.fixtures import GridSpec, make_dem_fixture
from error_analysis_spark.pipeline import analyze_pair


def test_analyze_pair_recovers_truth(spark):
    fx = make_dem_fixture(n_rows=160, n_cols=160, range_m=32.0, sill=0.04,
                          noise_std=0.05, bias=0.15, feature_dz=-1.2,
                          seed=23)
    px = spark.createDataFrame(fx.pixels)
    ref = px.where(F.col("dataset_id") == "reference_dem")
    cmp_ = px.where(F.col("dataset_id") == "compare_dem")
    g = GridSpec("g", 160, 160, fx.truth["x0"], fx.truth["y0"],
                 fx.truth["res"])
    res = analyze_pair(ref, cmp_, g, g, spark.createDataFrame(fx.zones),
                       seed=23)

    # bias recovered within bootstrap uncertainty (A6/A7)
    assert abs(res.bias - 0.15) < max(5 * res.bias_std, 0.03)
    # rms ≈ sqrt(noise² + sill) on the stable area
    assert abs(res.rms - np.sqrt(0.05 ** 2 + 0.04)) < 0.05
    # zonal stats: unstable zones centred near feature_dz
    zonal = res.zonal.toPandas().set_index("zone_id")
    for z in ("unstable1", "unstable2"):
        assert abs(zonal.loc[z, "mean"] - (-1.2)) < 0.25
    # fitted sill in the right ballpark (stable-area variogram)
    total_sill = float(np.sum(res.fit["params"][:int(res.fit["n_comp"])]))
    if bool(res.fit["nugget"]):
        total_sill += float(res.fit["params"][-1])
    assert 0.01 < total_sill < 0.12, total_sill
    # σ_A present for both unstable zones, positive, and far below the
    # feature signal (detectability)
    assert set(res.sigma_a) == {"unstable1", "unstable2"}
    for v in res.sigma_a.values():
        assert 0 < v < 0.5
