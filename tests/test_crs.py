"""CRS transform (R1-full/SC16/U7) tests: absolute correctness of the
transverse-Mercator series against independent numerical integration,
round-trip identity, the pandas-UDF surface, cross-CRS regrid vs a
driver-side numpy check, and the geoid-offset join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.fixtures import GridSpec
from error_analysis_spark.functions import crs as CRS


def test_forward_origin_and_meridian_arc():
    # central meridian, equator → false easting exactly
    e, n = CRS.utm_forward_np([-105.0], [0.0], zone=13)
    assert e[0] == pytest.approx(500_000.0, abs=1e-9)
    assert n[0] == pytest.approx(0.0, abs=1e-9)
    # northing along the central meridian must equal K0 × meridian arc
    # length — checked against an INDEPENDENT numerical integral of the
    # ellipsoid meridian radius (no shared code with the series)
    e2 = CRS.F_WGS84 * (2 - CRS.F_WGS84)
    for lat in (10.0, 45.0, 80.0):
        t = np.linspace(0.0, np.radians(lat), 500_001)
        m = CRS.A_WGS84 * np.trapz(
            (1 - e2) * (1 - e2 * np.sin(t) ** 2) ** -1.5, t)
        _, n = CRS.utm_forward_np([-105.0], [lat], 13)
        assert n[0] == pytest.approx(CRS.K0 * m, abs=1e-4)


def test_roundtrip_subnanometer():
    rng = np.random.RandomState(0)
    lon = -108 + 6 * rng.rand(20_000)
    lat = -80 + 160 * rng.rand(20_000)
    E, N = CRS.utm_forward_np(lon, lat, 13)
    lon2, lat2 = CRS.utm_inverse_np(E, N, 13)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12
    # southern-hemisphere false northing
    Es, Ns = CRS.utm_forward_np([-105.5], [-33.0], 13, south=True)
    lon3, lat3 = CRS.utm_inverse_np(Es, Ns, 13, south=True)
    assert lat3[0] == pytest.approx(-33.0, abs=1e-12)
    assert Ns[0] > 6_000_000  # false northing applied


def test_udf_matches_numpy(spark):
    pdf = pd.DataFrame({
        "lon": [-107.5, -105.0, -102.3], "lat": [31.0, 44.5, -12.25]})
    sdf = spark.createDataFrame(pdf)
    fwd = CRS.utm_forward_udf(13)
    out = (sdf.withColumn("p", fwd(F.col("lon"), F.col("lat")))
           .select("p.x", "p.y").toPandas())
    e, n = CRS.utm_forward_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 13)
    assert np.allclose(out["x"], e, atol=1e-9)
    assert np.allclose(out["y"], n, atol=1e-9)


def test_cross_crs_regrid_matches_driver_check(spark):
    """regrid_cross_crs (pandas-UDF transform → nearest re-bin) must land
    within 1e-6 m of the same computation done driver-side in numpy."""
    rng = np.random.RandomState(7)
    n_px = 4000
    # a patch in UTM zone 13 near the zone 13/14 boundary (lon ≈ -102)
    x13 = 780_000.0 + 8_000.0 * rng.rand(n_px)
    y13 = 3_500_000.0 + 8_000.0 * rng.rand(n_px)
    val = np.round(rng.standard_normal(n_px), 3)
    pdf = pd.DataFrame({"row": np.arange(n_px), "col": np.arange(n_px),
                        "x": x13, "y": y13, "value": val})
    # destination grid in zone 14 covering the transformed patch
    xt, yt = CRS.utm_to_utm_np(x13, y13, 13, 14)
    res = 500.0
    x0 = np.floor(xt.min() / res) * res
    y0 = np.ceil(yt.max() / res) * res
    dst = GridSpec("z14", width=64, height=64, x0=float(x0), y0=float(y0),
                   res=res)

    out = CRS.regrid_cross_crs(spark.createDataFrame(pdf), 13, 14, dst) \
        .toPandas().sort_values(["row", "col"]).reset_index(drop=True)

    # driver-side check: same transform + nearest-to-cell-center pick
    t_row = np.floor((dst.y0 - yt) / res).astype(int)
    t_col = np.floor((xt - dst.x0) / res).astype(int)
    ok = (t_row >= 0) & (t_row < dst.height) & (t_col >= 0) & (t_col < dst.width)
    cx = dst.x0 + (t_col + 0.5) * res
    cy = dst.y0 - (t_row + 0.5) * res
    d2 = (xt - cx) ** 2 + (yt - cy) ** 2
    best: dict = {}
    for i in np.where(ok)[0]:
        key = (t_row[i], t_col[i])
        if key not in best or d2[i] < best[key][0]:
            best[key] = (d2[i], val[i])
    exp = pd.DataFrame(
        [(r, c, v) for (r, c), (_, v) in best.items()],
        columns=["row", "col", "value"]).sort_values(["row", "col"]) \
        .reset_index(drop=True)
    assert len(out) == len(exp)
    assert (out["row"].to_numpy() == exp["row"].to_numpy()).all()
    assert (out["col"].to_numpy() == exp["col"].to_numpy()).all()
    assert np.allclose(out["value"], exp["value"], atol=0)
    # transformed cell centers themselves are exact grid math
    assert np.allclose(out["x"], dst.x0 + (out["col"] + 0.5) * res, atol=1e-6)


def test_geoid_offset_join(spark):
    grid = GridSpec("geoid", width=4, height=4, x0=0.0, y0=40.0, res=10.0)
    geoid = spark.createDataFrame(
        [(r, c, float(r * 10 + c) / 100.0) for r in range(4) for c in range(4)],
        "row int, col int, offset double")
    px = spark.createDataFrame(
        pd.DataFrame({"x": [5.0, 15.0, 35.0], "y": [35.0, 25.0, 5.0],
                      "value": [100.0, 200.0, 300.0]}))
    out = CRS.apply_geoid_offset(px, geoid, grid).toPandas() \
        .sort_values("x").reset_index(drop=True)
    # (x=5,y=35) → g_row 0, g_col 0 → +0.00; (15,25) → row 1, col 1 → +0.11
    # (35,5) → row 3, col 3 → +0.33
    assert np.allclose(out["value"], [100.00, 200.11, 300.33])
    # direction=-1 subtracts
    out2 = CRS.apply_geoid_offset(px, geoid, grid, direction=-1).toPandas() \
        .sort_values("x").reset_index(drop=True)
    assert np.allclose(out2["value"], [100.00, 199.89, 299.67])
