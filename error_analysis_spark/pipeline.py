"""High-level analysis pipeline — the reference's notebook chain
(SURVEY §3 E3, error_analysis_notebook.ipynb cells [10]→[89]) as one
composable API. A reference user's workflow maps 1:1:

    reference                               this engine
    ---------                               -----------
    RasterPairProcessor.process          →  step 1 (align_pair)
    TopoDifferencer.save_difference_…    →  step 2 (difference)
    TopoMapInteractor zones + derive     →  step 3 (membership/derive_stable)
    stats_all / stats_each               →  step 4 (zonal_stats)
    median bias + bootstrap + subtract   →  step 5
    calculate_mean_variogram_numba       →  step 6 (empirical_variogram)
    fit_best_spherical_model             →  step 7
    RegionalUncertaintyEstimator         →  step 8 (estimate_sigma_a)

Everything before `.collect()` stays one lazy DataFrame DAG; the only
materializations are the tiny model-facing tables (variogram bins, fit
params), exactly where the reference materializes whole GeoTIFFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from error_analysis_spark.fixtures import GridSpec
from error_analysis_spark.operators import align as AL
from error_analysis_spark.operators import stats as ST
from error_analysis_spark.operators import uncertainty as UN
from error_analysis_spark.operators import zones as ZN
from error_analysis_spark.operators.fitting import fit_best_spherical_model
from error_analysis_spark.operators.variogram import (
    VariogramParams, empirical_variogram,
)


@dataclass
class PairAnalysis:
    """Result bundle of `analyze_pair` (uncollected DataFrames unless
    noted)."""
    dod: DataFrame                      # row,col,x,y,dz (bias-corrected)
    bias: float                         # A6 median of stable Δz
    bias_std: float                     # A7 bootstrap std of the median
    rms: float                          # A8 over stable, post-correction
    zonal: DataFrame                    # A2 per-zone stats
    variogram: Any                      # pandas: lag, gamma_mean, gamma_std
    fit: dict                           # U2 best model (params, aic, …)
    sigma_a: dict = field(default_factory=dict)  # zone_id → σ_A


def analyze_pair(reference: DataFrame, compare: DataFrame,
                 ref_grid: GridSpec, cmp_grid: GridSpec,
                 zones: DataFrame,
                 vario: VariogramParams | None = None,
                 sigma_method: str = "monte_carlo",
                 seed: int = 42) -> PairAnalysis:
    """Run the full differencing → uncertainty chain on a raster pair.

    `zones` must contain `kind='unstable'` polygons (features of
    interest); the stable area is derived as valid − unstable (SO2),
    exactly like the reference's derive_stable_from_unstable."""
    vario = vario or VariogramParams(bin_width=4.0, max_lag_multiplier=0.35,
                                     n_runs=8, max_samples=6000, seed=seed)

    # 1-2: align + difference (J1/R1/R4); inner join = crop-to-overlap
    dod = AL.difference(AL.align_pair(reference, compare, ref_grid, cmp_grid))
    dodv = dod.select("row", "col", "x", "y", F.col("dz").alias("value"))

    # 3: zone membership + stable derivation (J2/R8/SO2) — zones are
    # scanline-rasterized onto the common grid (O(V·rows + cells) per
    # tile vs O(V) ray casts per PIXEL), then membership is a plain
    # (row, col) join with zero geometry work on the big side
    common = ref_grid if (ref_grid.width * ref_grid.height
                          <= cmp_grid.width * cmp_grid.height) else cmp_grid
    burned = ZN.rasterize_membership(reference.sparkSession, zones, common)
    member = dodv.join(burned, ["row", "col"]).cache()
    foi = (member.where(F.col("kind") == "unstable")
           .select("row", "col").distinct())
    stable = (dodv.join(foi, ["row", "col"], "left_anti")
              .withColumn("zone_id", F.lit("stable")).cache())

    # 5: vertical bias (A6) + bootstrap uncertainty (A7) + subtract (R5)
    bias = ST.median_bias(stable).first()["bias"]
    stable_id = stable.withColumn(
        "row_id", F.col("row").cast("long") * F.lit(1 << 31) + F.col("col"))
    bias_std = ST.bootstrap_median_std(stable_id, n_boot=200,
                                       seed=seed).first()["median_std"]
    corrected = dodv.withColumn("value", F.col("value") - F.lit(bias)).cache()
    stable_c = stable.withColumn("value", F.col("value") - F.lit(bias))
    rms = ST.rms(stable_c).first()["rms"]

    # 4: zonal stats on the corrected DoD (A1/A2)
    member_c = member.withColumn("value", F.col("value") - F.lit(bias))
    # materialize zonal (one row per zone — tiny) through the membership
    # cache BEFORE member.unpersist(); otherwise the caller's first read
    # of result.zonal re-runs the rasterize+join lineage from scratch
    zonal = ST.zonal_stats(member_c).persist(StorageLevel.MEMORY_AND_DISK)
    zonal.count()

    # 6-7: variogram on the stable area (R6/J4/A3/A4/A5) + fit (U2)
    # the DoD lives on `common` (align_pair picks the smaller grid),
    # so the variogram's samples-per-area target must use ITS res —
    # ref_grid.res under-sampled 4x whenever compare was the smaller
    vg, _max_lag = empirical_variogram(stable_c, vario, res=common.res)
    vg_pdf = vg.toPandas()
    # last consumers of the stage caches have materialized — release
    # them so a survey loop over many pairs doesn't accumulate
    # raster-sized executor caches (same discipline as
    # empirical_variogram's internal unpersist)
    member.unpersist()
    stable.unpersist()
    _fits, best = fit_best_spherical_model(
        reference.sparkSession, vg_pdf.dropna(subset=["gamma_mean"]),
        seed=seed)

    # 8: σ_A per unstable zone (J5/A9 by default; method selectable)
    import numpy as np
    # params layout: [C1..Cn, a1..an, nugget?] (fitting._initial_params)
    params = np.asarray(best["params"], dtype=float)
    n_comp = int(best["n_comp"])
    sills = [float(v) for v in params[:n_comp]]
    ranges = [float(v) for v in params[n_comp:2 * n_comp]]
    nugget = float(params[-1]) if bool(best["nugget"]) else 0.0
    unstable = zones.where(F.col("kind") == "unstable")
    if sigma_method in ("fft", "analytical", "monte_carlo"):
        # one applyInPandas job wave covers ALL zones (bounded numpy
        # kernel per zone) — 500 zones ≠ 500 sequential cluster jobs
        out = UN.sigma_a_by_zone(unstable, sills, ranges, nugget,
                                 method=sigma_method, seed=seed)
        sigma_a = {r["zone_id"]: r["sigma_a"] for r in out.collect()}
    else:
        # brute_force: itself a distributed crossJoin — loop stays
        sigma_a = {}
        for z in unstable.collect():
            sigma_a[z["zone_id"]] = UN.estimate_sigma_a(
                reference.sparkSession, z["wkt"], sills, ranges, nugget,
                method=sigma_method, seed=seed)

    return PairAnalysis(dod=corrected, bias=float(bias),
                        bias_std=float(bias_std), rms=float(rms),
                        zonal=zonal, variogram=vg_pdf, fit=best,
                        sigma_a=sigma_a)
