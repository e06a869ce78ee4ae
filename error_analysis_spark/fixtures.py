"""Synthetic geospatial fixtures with known ground truth (FIXTURES.md).

Pure numpy/pandas — no Spark dependency — so the same arrays serve as
the single-node oracle for engine tests. Deterministic for a given seed
(reference contract SEED=42, error_analysis_notebook.ipynb cell [8]).

compare = reference + bias + correlated_field + noise + feature_signal:
- bias: constant (recovered by the A6 median, notebook cell [74]);
- correlated_field: Gaussian random field with a known 1-component
  spherical variogram (FFT spectral synthesis);
- noise: i.i.d. N(0, σ_n²) — the nugget / uncorrelated term (A8 RMS);
- feature_signal: applied only inside 'unstable' zones (real change);
- ~3% NULL pixels in ragged blobs (exercises F5, SO3, R3, R9).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

NODATA_FRACTION = 0.03


@dataclass
class GridSpec:
    """Grid metadata row (FIXTURES.md §1); mirrors the reference's raster
    profile (crs/transform/nodata, differencing_functions.py:51-146)."""
    dataset_id: str
    width: int = 256
    height: int = 256
    x0: float = 500_000.0
    y0: float = 4_000_000.0
    res: float = 1.0
    crs: str = "EPSG:32613"
    nodata: float = -9999.0


@dataclass
class DemFixture:
    grids: pd.DataFrame
    pixels: pd.DataFrame           # long format: dataset_id,row,col,x,y,value
    zones: pd.DataFrame            # zone_id,kind,name,wkt
    membership: pd.DataFrame       # dataset_id,row,col,zone_id (oracle)
    truth: dict = field(default_factory=dict)


def spherical_cov(h: np.ndarray, sill: float, rng: float) -> np.ndarray:
    """C(h) = sill·(1 − sph(h/a)) for the spherical model (SURVEY SC10/SC11)."""
    u = np.minimum(h / rng, 1.0)
    gamma = sill * (1.5 * u - 0.5 * u ** 3)
    return sill - gamma


def gaussian_field_spherical(n_rows: int, n_cols: int, res: float, sill: float,
                             rng_m: float, seed: int) -> np.ndarray:
    """FFT spectral synthesis of a stationary Gaussian field whose
    covariance is the spherical model — the standard circulant-embedding
    construction: spectrum = rFFT of the (wrapped) covariance kernel."""
    ny, nx = 2 * n_rows, 2 * n_cols  # pad to reduce wrap-around correlation
    iy = np.minimum(np.arange(ny), ny - np.arange(ny))
    ix = np.minimum(np.arange(nx), nx - np.arange(nx))
    hy = iy[:, None] * res
    hx = ix[None, :] * res
    cov = spherical_cov(np.hypot(hy, hx), sill, rng_m)
    spec = np.fft.rfft2(cov)
    spec_r = np.maximum(spec.real, 0.0)  # clip tiny negative eigenvalues
    rs = np.random.RandomState(seed)
    noise = rs.standard_normal((ny, nx))
    f = np.fft.irfft2(np.fft.rfft2(noise) * np.sqrt(spec_r), s=(ny, nx))
    f *= np.sqrt(ny * nx) / np.sqrt((ny * nx))
    field2 = f[:n_rows, :n_cols]
    # normalize to the target variance exactly (finite-grid correction)
    field2 = field2 * (np.sqrt(sill) / field2.std())
    return field2 - field2.mean()


def _terrain(n_rows: int, n_cols: int, res: float) -> np.ndarray:
    """Smooth synthetic terrain: sum of low-frequency sinusoids."""
    y, x = np.mgrid[0:n_rows, 0:n_cols].astype(np.float64)
    return (
        50.0
        + 8.0 * np.sin(2 * np.pi * x * res / 400.0)
        + 6.0 * np.cos(2 * np.pi * y * res / 300.0)
        + 3.0 * np.sin(2 * np.pi * (x + y) * res / 250.0)
    )


def _nodata_mask(n_rows: int, n_cols: int, seed: int,
                 fraction: float = NODATA_FRACTION) -> np.ndarray:
    """Ragged nodata blobs: threshold a smoothed random field."""
    rs = np.random.RandomState(seed + 77)
    f = rs.standard_normal((n_rows, n_cols))
    # cheap smoothing: repeated 3x3 box blur via rolls
    for _ in range(6):
        f = sum(np.roll(np.roll(f, dy, 0), dx, 1)
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
    thresh = np.quantile(f, 1.0 - fraction)
    return f > thresh


def _rect_wkt(x0: float, y0: float, x1: float, y1: float) -> str:
    return (f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, "
            f"{x0} {y1}, {x0} {y0}))")


def make_dem_fixture(n_rows: int = 256, n_cols: int = 256, res: float = 1.0,
                     bias: float = 0.12, sill: float = 0.04,
                     range_m: float = 60.0, noise_std: float = 0.05,
                     feature_dz: float = -1.5, seed: int = 42) -> DemFixture:
    """Build the two-DEM fixture with known truth components."""
    spec_ref = GridSpec("reference_dem", n_cols, n_rows, res=res)
    spec_cmp = GridSpec("compare_dem", n_cols, n_rows, res=res)

    terrain = _terrain(n_rows, n_cols, res)
    corr = gaussian_field_spherical(n_rows, n_cols, res, sill, range_m, seed)
    rs = np.random.RandomState(seed + 1)
    noise = rs.standard_normal((n_rows, n_cols)) * noise_std

    # zones in world coordinates (y decreases with row: north-up grid)
    def cell_bounds(r0, c0, r1, c1):
        x_lo = spec_ref.x0 + c0 * res
        x_hi = spec_ref.x0 + c1 * res
        y_hi = spec_ref.y0 - r0 * res
        y_lo = spec_ref.y0 - r1 * res
        return x_lo, y_lo, x_hi, y_hi

    qr, qc = n_rows // 4, n_cols // 4
    unstable_rects = [
        (qr // 2, qc // 2, qr + qr // 2, qc + qc // 2),
        (2 * qr, 2 * qc, 3 * qr, 3 * qc),
    ]
    zones_rows = []
    feat = np.zeros((n_rows, n_cols))
    member_rows = []
    for i, (r0, c0, r1, c1) in enumerate(unstable_rects):
        feat[r0:r1, c0:c1] = feature_dz
        zones_rows.append({
            "zone_id": f"unstable{i + 1}", "kind": "unstable",
            "name": f"unstable{i + 1}",
            "wkt": _rect_wkt(*cell_bounds(r0, c0, r1, c1)),
        })
        rr, cc = np.mgrid[r0:r1, c0:c1]
        member_rows.append(pd.DataFrame({
            "row": rr.ravel(), "col": cc.ravel(),
            "zone_id": f"unstable{i + 1}",
        }))
    # one explicit stable rectangle away from the unstable ones
    sr = (3 * qr + qr // 2, qc // 2, 4 * qr - 2, qc + qc // 2)
    zones_rows.append({
        "zone_id": "stable1", "kind": "stable", "name": "stable1",
        "wkt": _rect_wkt(*cell_bounds(*sr)),
    })
    rr, cc = np.mgrid[sr[0]:sr[2], sr[1]:sr[3]]
    member_rows.append(pd.DataFrame({
        "row": rr.ravel(), "col": cc.ravel(), "zone_id": "stable1"}))

    compare = terrain + bias + corr + noise + feat
    mask_ref = _nodata_mask(n_rows, n_cols, seed)
    mask_cmp = _nodata_mask(n_rows, n_cols, seed + 500)

    def to_long(dataset_id: str, arr: np.ndarray, mask: np.ndarray) -> pd.DataFrame:
        rr, cc = np.mgrid[0:n_rows, 0:n_cols]
        vals = arr.astype(np.float64).copy()
        vals[mask] = np.nan
        df = pd.DataFrame({
            "dataset_id": dataset_id,
            "band": np.int32(1),
            "row": rr.ravel().astype(np.int32),
            "col": cc.ravel().astype(np.int32),
            "value": vals.ravel(),
        })
        df["x"] = spec_ref.x0 + (df["col"] + 0.5) * res
        df["y"] = spec_ref.y0 - (df["row"] + 0.5) * res
        df.loc[np.isnan(df["value"]), "value"] = None
        return df[["dataset_id", "band", "row", "col", "x", "y", "value"]]

    pixels = pd.concat([
        to_long("reference_dem", terrain, mask_ref),
        to_long("compare_dem", compare, mask_cmp),
    ], ignore_index=True)

    grids = pd.DataFrame([vars(spec_ref), vars(spec_cmp)])
    zones = pd.DataFrame(zones_rows)
    membership = pd.concat(member_rows, ignore_index=True)
    membership.insert(0, "dataset_id", "dod")

    truth = {
        "bias": bias, "sill": sill, "range_m": range_m,
        "noise_std": noise_std, "feature_dz": feature_dz,
        "terrain": terrain, "corr": corr, "noise": noise,
        "mask_ref": mask_ref, "mask_cmp": mask_cmp, "feature": feat,
        "res": res, "x0": spec_ref.x0, "y0": spec_ref.y0,
    }
    return DemFixture(grids, pixels, zones, membership, truth)


def make_pointcloud(n_points: int = 20_000, seed: int = 42,
                    x0: float = 500_000.0, y0: float = 4_000_000.0,
                    extent: float = 200.0) -> pd.DataFrame:
    """LAS-like point table (FIXTURES.md §5): ground (2), noise (7/18),
    vegetation (1/5) classes; gps_time spans the LAS-1.4 adjustment branch."""
    rs = np.random.RandomState(seed)
    x = x0 + rs.uniform(0, extent, n_points)
    y = y0 - rs.uniform(0, extent, n_points)
    ground = 30.0 + 0.01 * (x - x0) + 0.02 * (y0 - y)
    cls = rs.choice([2, 1, 5, 7, 18], n_points, p=[0.6, 0.2, 0.12, 0.05, 0.03])
    z = ground + np.where(
        cls == 2, rs.normal(0, 0.05, n_points),
        np.where(np.isin(cls, (1, 5)), rs.uniform(0.5, 15.0, n_points),
                 rs.normal(0, 40.0, n_points)))  # noise class: wild outliers
    gps = rs.uniform(1.2e9, 1.3e9, n_points)
    gps[: n_points // 10] = rs.uniform(1e8, 9e8, n_points // 10)  # pre-adjustment
    return pd.DataFrame({
        "point_id": np.arange(n_points, dtype=np.int64),
        "x": x, "y": y, "z": z,
        "classification": cls.astype(np.int32),
        "gps_time": gps,
        "return_number": rs.randint(1, 4, n_points).astype(np.int32),
    })
