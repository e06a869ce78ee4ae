"""Domain-chain benchmark (supplementary to bench.py): times the full
reference-notebook pipeline (`pipeline.analyze_pair`) on synthetic DEM
pairs at growing grid sizes. Run directly:

    python bench_chain.py [sizes...]    # default 256 512

Prints one JSON line per size with stage-inclusive wall time and the
recovered statistics (so regressions in either speed OR accuracy are
visible)."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512]
    from pyspark.sql import functions as F

    from error_analysis_spark.fixtures import GridSpec, make_dem_fixture
    from error_analysis_spark.pipeline import analyze_pair
    from error_analysis_spark.session import get_spark

    spark = get_spark("bench-chain")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        fx = make_dem_fixture(n_rows=n, n_cols=n, range_m=max(24.0, n / 8),
                              seed=99)
        px = spark.createDataFrame(fx.pixels)
        g = GridSpec("g", n, n, fx.truth["x0"], fx.truth["y0"],
                     fx.truth["res"])
        t0 = time.perf_counter()
        res = analyze_pair(
            px.where(F.col("dataset_id") == "reference_dem"),
            px.where(F.col("dataset_id") == "compare_dem"),
            g, g, spark.createDataFrame(fx.zones), seed=99)
        res.zonal.count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "chain_sec", "grid": n, "value": round(dt, 1),
            "unit": "sec",
            "bias": round(res.bias, 4), "rms": round(res.rms, 4),
            "sigma_a": {k: round(v, 4) for k, v in res.sigma_a.items()},
        }))
    spark.stop()


if __name__ == "__main__":
    main()
