"""CRS transforms without pyproj — SURVEY §2 R1-full / SC16 / U7.

Reference semantics: differencing_functions.py:1156-1202 (UTM-from-AOI +
`reproject_polygon` via pyproj Transformer), 2056-2116 (common-UTM
alignment in `RasterPairProcessor.process`), 2239-2277
(`GeoidTransformer.transform`: compound CRS + vertical-datum shift via
gdal.Warp). The reference's dominant case is UTM↔geographic on WGS84 —
that needs no pyproj: this module implements the transverse-Mercator
projection with the standard Krüger flattening series to order n⁶
(Karney 2011's exposition of Krüger 1912 — public formulas), accurate
to sub-micrometer within a UTM zone's ±3° of central meridian, far
below the reference's GDAL warp tolerance.

Everything is a vectorized numpy kernel (`*_np`) plus an Arrow-batched
pandas-UDF wrapper — the U7 "pyproj scalar UDF" surface with the
dependency replaced by math. The vertical-datum shift (GeoidTransformer)
is `value + geoid_offset` via a broadcast join against a geoid-grid
pixel table — geoid grids are coarse (arcminutes), so the offset table
is always broadcastable and the big pixel side never shuffles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from error_analysis_spark.fixtures import GridSpec

# WGS84 ellipsoid + UTM convention constants
A_WGS84 = 6_378_137.0
F_WGS84 = 1.0 / 298.257223563
K0 = 0.9996
FALSE_E = 500_000.0
FALSE_N_SOUTH = 10_000_000.0

_n = F_WGS84 / (2.0 - F_WGS84)
_n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6
# rectifying-radius A and the Krüger alpha/beta series to n^6
_A_RECT = A_WGS84 / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)
_ALPHA = (
    _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180
    - 127 * _n5 / 288 + 7891 * _n6 / 37800,
    13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630
    - 1983433 * _n6 / 1935360,
    61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880
    + 167603 * _n6 / 181440,
    49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
    34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
    212378941 * _n6 / 319334400,
)
_BETA = (
    _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512
    + 96199 * _n6 / 604800,
    _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105
    - 1118711 * _n6 / 3870720,
    17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480
    + 5569 * _n6 / 90720,
    4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
    4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
    20648693 * _n6 / 638668800,
)
_E2 = F_WGS84 * (2.0 - F_WGS84)          # first eccentricity squared
_SQRT_N = 2.0 * math.sqrt(_n) / (1.0 + _n)


def zone_central_lon(zone: int) -> float:
    """Central meridian of a UTM zone (SC16 inverse of utm_zone)."""
    return float(zone) * 6.0 - 183.0


def utm_forward_np(lon_deg, lat_deg, zone: int, south: bool = False):
    """Geographic (WGS84 degrees) → UTM easting/northing (meters)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64)
                     - zone_central_lon(zone))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(phi)
    # conformal latitude via Gauss–Schreiber: t = sinh(atanh s − 2√n/(1+n)·atanh(2√n/(1+n)·s))
    t = np.sinh(np.arctanh(s) - _SQRT_N * np.arctanh(_SQRT_N * s))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(_ALPHA, start=1):
        x += a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y += a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    easting = FALSE_E + K0 * _A_RECT * x
    northing = K0 * _A_RECT * y + (FALSE_N_SOUTH if south else 0.0)
    return easting, northing


def utm_inverse_np(easting, northing, zone: int, south: bool = False):
    """UTM easting/northing (meters) → geographic (WGS84 degrees)."""
    eta = (np.asarray(easting, dtype=np.float64) - FALSE_E) / (K0 * _A_RECT)
    xi = (np.asarray(northing, dtype=np.float64)
          - (FALSE_N_SOUTH if south else 0.0)) / (K0 * _A_RECT)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    # Gauss–Schreiber back to geographic: Newton on τ = tanφ
    tau_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
    tau = tau_p.copy()
    for _ in range(5):  # quadratic convergence; 5 is overkill by far
        sig = np.sinh(_SQRT_N * np.arctanh(_SQRT_N * tau
                                           / np.sqrt(1.0 + tau**2)))
        f_tau = tau * np.sqrt(1.0 + sig**2) - sig * np.sqrt(1.0 + tau**2) \
            - tau_p
        d_tau = ((np.sqrt((1.0 + sig**2) * (1.0 + tau**2))
                  - sig * tau) * (1.0 - _E2) * np.sqrt(1.0 + tau**2)
                 / (1.0 + (1.0 - _E2) * tau**2))
        tau = tau - f_tau / d_tau
    lat = np.degrees(np.arctan(tau))
    lon = zone_central_lon(zone) + np.degrees(
        np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    return lon, lat


def utm_to_utm_np(x, y, src_zone: int, dst_zone: int,
                  src_south: bool = False, dst_south: bool = False):
    """UTM zone → UTM zone (the RasterPairProcessor common-UTM case)."""
    lon, lat = utm_inverse_np(x, y, src_zone, src_south)
    return utm_forward_np(lon, lat, dst_zone, dst_south)


# --------------------------------------------------------------------------
# pandas-UDF surface (U7) — struct<x,y> out, Arrow-batched
# --------------------------------------------------------------------------

def utm_forward_udf(zone: int, south: bool = False):
    @pandas_udf("x double, y double")
    def fwd(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        e, n = utm_forward_np(lon.to_numpy(), lat.to_numpy(), zone, south)
        return pd.DataFrame({"x": e, "y": n})
    return fwd


def utm_inverse_udf(zone: int, south: bool = False):
    @pandas_udf("lon double, lat double")
    def inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = utm_inverse_np(x.to_numpy(), y.to_numpy(), zone, south)
        return pd.DataFrame({"lon": lon, "lat": lat})
    return inv


def reproject_pixels(pixels: DataFrame, src_zone: int, dst_zone: int,
                     src_south: bool = False,
                     dst_south: bool = False) -> DataFrame:
    """R1 (CRS leg) — rewrite pixel x/y into the destination UTM zone.
    One Arrow-batched projection pass; no shuffle (narrow transform)."""
    @pandas_udf("x double, y double")
    def tx(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        e, n = utm_to_utm_np(x.to_numpy(), y.to_numpy(), src_zone, dst_zone,
                             src_south, dst_south)
        return pd.DataFrame({"x": e, "y": n})

    out = pixels.withColumn("_t", tx(F.col("x"), F.col("y")))
    return (out.drop("x", "y")
            .withColumn("x", F.col("_t.x"))
            .withColumn("y", F.col("_t.y"))
            .drop("_t"))


def regrid_cross_crs(pixels: DataFrame, src_zone: int, dst_zone: int,
                     dst: GridSpec, method: str = "nearest",
                     src_south: bool = False,
                     dst_south: bool = False) -> DataFrame:
    """R1-full — reproject into the destination zone, then re-bin onto
    `dst` with the same nearest/mean resampler as same-CRS regrid (the
    engine restatement of `reproject_match`/gdal.Warp,
    differencing_functions.py:96-112, 2092-2105)."""
    from error_analysis_spark.operators.align import regrid
    moved = reproject_pixels(pixels, src_zone, dst_zone, src_south, dst_south)
    return regrid(moved, dst, method)


# --------------------------------------------------------------------------
# vertical datum (GeoidTransformer, differencing_functions.py:2239-2277)
# --------------------------------------------------------------------------

def apply_geoid_offset(pixels: DataFrame, geoid: DataFrame, geoid_grid:
                       GridSpec, value: str = "value",
                       direction: int = +1) -> DataFrame:
    """Vertical-datum shift: value ± geoid undulation at the pixel's
    location, as a broadcast join against the geoid-grid cell containing
    (x, y). direction=+1 converts orthometric→ellipsoidal (h = H + N);
    −1 the reverse — the two sides of GeoidTransformer's compound-CRS
    warp. `geoid`: (row, col, offset)."""
    g_row = F.floor((F.lit(geoid_grid.y0) - F.col("y"))
                    / F.lit(geoid_grid.res)).cast("int")
    g_col = F.floor((F.col("x") - F.lit(geoid_grid.x0))
                    / F.lit(geoid_grid.res)).cast("int")
    tagged = pixels.withColumn("_gr", g_row).withColumn("_gc", g_col)
    g = geoid.select(F.col("row").alias("_gr"), F.col("col").alias("_gc"),
                     "offset")
    return (tagged.join(F.broadcast(g), ["_gr", "_gc"], "left")
            .withColumn(value, F.col(value)
                        + F.lit(float(direction)) * F.coalesce("offset",
                                                               F.lit(0.0)))
            .drop("_gr", "_gc", "offset"))
