"""R8 scanline rasterization parity: rasterize_membership must produce
EXACTLY the cell set of the per-pixel PIP membership join (same even-odd
half-open convention), including jagged polygons and holes."""

from __future__ import annotations

import numpy as np
import pandas as pd

from error_analysis_spark.fixtures import GridSpec
from error_analysis_spark.operators import zones as ZN


def _grid_pixels(spark, n: int):
    rows = [(r, c, c + 0.5, float(n) - (r + 0.5), 1.0)
            for r in range(n) for c in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["row", "col", "x", "y", "value"]))


def test_scanline_matches_pip(spark):
    n = 150
    grid = GridSpec("g", width=n, height=n, x0=0.0, y0=float(n), res=1.0)
    px = _grid_pixels(spark, n)
    rng = np.random.RandomState(5)
    ang = np.sort(rng.rand(40) * 2 * np.pi)
    rad = 30 + 20 * rng.rand(40)
    pts = [(75 + rad[i] * np.cos(ang[i]), 75 + rad[i] * np.sin(ang[i]))
           for i in range(40)]
    pts.append(pts[0])
    blob = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    zones = spark.createDataFrame([
        ("rect", "stable", "r",
         "POLYGON ((10 10, 60 10, 60 60, 10 60, 10 10))"),
        ("diamond", "unstable", "d",
         "POLYGON ((14.5 100, 40 125.5, 65.5 100, 40 74.5, 14.5 100))"),
        ("blob", "unstable", "b", f"POLYGON (({blob}))"),
        ("withhole", "unstable", "h",
         "POLYGON ((100 10, 140 10, 140 50, 100 50, 100 10), "
         "(110 20, 130 20, 130 40, 110 40, 110 20))"),
    ], ["zone_id", "kind", "name", "wkt"])

    pip = ZN.membership(px, zones).select("row", "col", "zone_id").toPandas()
    burned = ZN.rasterize_membership(spark, zones, grid, tile=64)
    scan = px.join(burned, ["row", "col"]) \
        .select("row", "col", "zone_id").toPandas()
    k_pip = set(map(tuple, pip.values.tolist()))
    k_scan = set(map(tuple, scan.values.tolist()))
    assert k_pip == k_scan, (
        f"pip-only={list(k_pip - k_scan)[:5]} "
        f"scan-only={list(k_scan - k_pip)[:5]}")
    # the hole's interior is actually excluded
    assert not any(110 < c + 0.5 < 130 and 20 < 150 - (r + 0.5) < 40
                   for r, c, z in k_scan if z == "withhole")
