"""Model fitting + uncertainty propagation tests.

Mirrors the reference's own validation design (SURVEY §5.1/§5.2):
cross-method σ_A agreement on a known model, parameter recovery from a
clean synthetic variogram, nugget-only AIC win on white noise, bootstrap
CIs covering truth, CV sanity.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from error_analysis_spark.operators import fitting as FT
from error_analysis_spark.operators import stats as ST
from error_analysis_spark.operators import uncertainty as UN

SILLS = [0.04]
RANGES = [150.0]
NUGGET = 0.0025
RECT = "POLYGON ((0 0, 1000 0, 1000 600, 0 600, 0 0))"


def _clean_variogram(n_bins=60, bin_width=10.0):
    lag = np.arange(n_bins) * bin_width + bin_width / 2
    gamma = UN.gamma_np(lag, SILLS, RANGES, NUGGET)
    return pd.DataFrame({
        "lag": lag, "gamma_mean": gamma,
        "gamma_std": np.full(n_bins, 0.002),
    })


def test_fit_recovers_known_params(spark):
    fits, best = FT.fit_best_spherical_model(spark, _clean_variogram(),
                                             sigma_type="std", n_inits=3)
    assert best["aic"] < np.inf
    n_comp, nugget = int(best["n_comp"]), bool(best["nugget"])
    params = np.asarray(best["params"])
    sill_fit = params[:n_comp].sum()
    nug_fit = params[-1] if nugget else 0.0
    rng_fit = params[n_comp:2 * n_comp].max()
    assert abs(sill_fit + nug_fit - (SILLS[0] + NUGGET)) < 0.004
    assert abs(rng_fit - RANGES[0]) / RANGES[0] < 0.15


def test_white_noise_prefers_flat_model(spark):
    """White noise ⇒ flat variogram at σ²; the winning model must predict
    an essentially flat curve (SURVEY §5.2-3a)."""
    rng = np.random.RandomState(0)
    n = 50
    lag = np.arange(n) * 10.0 + 5.0
    gamma = 0.01 + rng.standard_normal(n) * 1e-4
    pdf = pd.DataFrame({"lag": lag, "gamma_mean": gamma,
                        "gamma_std": np.full(n, 1e-4)})
    fits, best = FT.fit_best_spherical_model(spark, pdf, n_inits=3)
    params = np.asarray(best["params"])
    n_comp, nugget = int(best["n_comp"]), bool(best["nugget"])
    pred = FT.spherical_gamma_np(lag, params, n_comp, nugget)
    assert np.ptp(pred) < 0.002  # flat within 20% of sill
    assert abs(pred.mean() - 0.01) < 0.001


def test_bootstrap_percentiles_cover_truth(spark):
    boot = FT.bootstrap_fit(spark, _clean_variogram(), n_comp=1, nugget=True,
                            n_boot=60)
    pct = ST.param_percentiles(boot, "param_idx", "value").toPandas() \
        .set_index("param_idx")
    # param 0 = sill, 1 = range, 2 = nugget
    assert pct.loc[0, "p16"] - 0.01 <= SILLS[0] <= pct.loc[0, "p84"] + 0.01
    assert pct.loc[1, "p16"] - 30 <= RANGES[0] <= pct.loc[1, "p84"] + 30


def test_cross_validation_small_error(spark):
    cv = FT.cross_validate(spark, _clean_variogram(), n_comp=1, nugget=True)
    assert cv["rmse"].mean() < 0.002


def test_sigma_a_methods_agree(spark):
    """The reference's core validation promoted to an assertion
    (variography_uncertainty.py:995): all estimators converge on σ_A for
    the same γ and polygon."""
    ana = UN.estimate_analytical(UN.polygon_area(RECT), SILLS, RANGES, NUGGET)
    brute = UN.estimate_brute_force(spark, RECT, SILLS, RANGES, NUGGET,
                                    grid_points=60)
    mc = UN.estimate_monte_carlo(spark, RECT, SILLS, RANGES, NUGGET,
                                 n_pairs=60_000, seed=42)
    fft = UN.estimate_fft(RECT, SILLS, RANGES, NUGGET, grid_points=128)
    # brute force is the ground truth for this polygon; the analytical
    # disk approximation carries shape error (rectangle ≠ disk) — the
    # reference accepts it as a fast approximation
    assert abs(mc - brute) / brute < 0.05
    assert abs(fft - brute) / brute < 0.05
    assert abs(ana - brute) / brute < 0.30
    # Hugonnet over the same rectangle's pixel grid (coarse 50x30)
    xs = np.linspace(10, 990, 50)
    ys = np.linspace(10, 590, 30)
    xx, yy = np.meshgrid(xs, ys)
    pix = spark.createDataFrame(
        pd.DataFrame({"x": xx.ravel(), "y": yy.ravel()}))
    hug = UN.estimate_hugonnet(pix, SILLS, RANGES, NUGGET, k_centers=80)
    assert abs(hug - brute) / brute < 0.15


def test_closed_form_and_quadrature():
    comps = UN.closed_form_correlated(SILLS, RANGES, n=10_000, res=1.0)
    # √(2·0.04)/100 · √(π·150²/5) ≈ 0.000283·118.8
    expect = math.sqrt(2 * 0.04) / 100 * math.sqrt(math.pi * 150 ** 2 / 5)
    assert comps[0] == pytest.approx(expect)
    assert UN.quadrature_total([3.0, 4.0]) == pytest.approx(5.0)
    assert UN.mean_random_uncorrelated(0.05, 2500) == pytest.approx(0.001)


def test_monte_carlo_np_matches_distributed(spark):
    """The per-zone numpy MC kernel (used by sigma_a_by_zone) shares the
    exact sampling streams with the distributed estimator — same seeds
    must give the same estimate up to float summation order."""
    mc = UN.estimate_monte_carlo(spark, RECT, SILLS, RANGES, NUGGET,
                                 n_pairs=30_000, seed=7)
    mc_np = UN.estimate_monte_carlo_np(RECT, SILLS, RANGES, NUGGET,
                                       n_pairs=30_000, seed=7)
    assert mc_np == pytest.approx(mc, rel=1e-9)


def test_uniform_points_deterministic(spark):
    a = UN.uniform_points_in_polygon(spark, RECT, 5000, seed=9).toPandas()
    b = UN.uniform_points_in_polygon(spark, RECT, 5000, seed=9).toPandas()
    assert len(a) == 5000
    assert np.allclose(np.sort(a["x"].to_numpy()), np.sort(b["x"].to_numpy()))
    assert a["x"].between(0, 1000).all() and a["y"].between(0, 600).all()
