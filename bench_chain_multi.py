"""Multi-run chain scale probe (supplementary to bench.py): times
`pipeline.analyze_pair_chain_multi` — the E3 spine with the
reference's CANONICAL multi-run variography — at growing grid sizes
and run counts, up to the notebook-canonical n_runs=30
(error_analysis_notebook.ipynb cell [78]). Run directly:

    python bench_chain_multi.py [grid:runs ...]   # default 256:8 512:30

One JSON line per config: wall time for the WHOLE lazy DAG evaluated
in one action (xxhash64 over every output column), plus the A5 block
size, so both speed and output-shape regressions are visible. The
run-count axis is the scale story: runs fan out row-locally before
ONE shared pair-join shuffle stage, so 30 runs must cost far less
than 30× one run."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    configs = [(int(a.split(":")[0]), int(a.split(":")[1]))
               for a in sys.argv[1:]] or [(256, 8), (512, 30)]
    from pyspark.sql import functions as F

    from error_analysis_spark import cachereg
    from error_analysis_spark.fixtures import GridSpec, make_dem_fixture
    from error_analysis_spark.pipeline import analyze_pair_chain_multi
    from error_analysis_spark.session import get_spark

    spark = get_spark("bench-chain-multi")
    spark.sparkContext.setLogLevel("ERROR")
    for n, n_runs in configs:
        fx = make_dem_fixture(n_rows=n, n_cols=n, range_m=max(24.0, n / 8),
                              seed=99)
        px = spark.createDataFrame(fx.pixels).cache()
        px.count()
        g = GridSpec("g", n, n, fx.truth["x0"], fx.truth["y0"],
                     fx.truth["res"])
        ref = px.where(F.col("dataset_id") == "reference_dem")
        cmp_ = px.where(F.col("dataset_id") == "compare_dem")
        with cachereg.scoped():
            t0 = time.perf_counter()
            chain = analyze_pair_chain_multi(
                ref, cmp_, g, g, n_runs=n_runs, max_samples=3000,
                max_lag=float(n) / 4, bin_width=float(n) / 40,
                min_pairs=10)
            out = chain.cache()
            out.agg(F.count(F.xxhash64(*[F.col(c)
                                         for c in out.columns]))).first()
            mean_rows = out.where(F.col("stage") == "vario_mean").count()
            runs_seen = (out.where(F.col("stage") == "vario")
                         .select("run").distinct().count())
            dt = time.perf_counter() - t0
            out.unpersist()
        px.unpersist()
        print(json.dumps({
            "metric": "chain_multi_sec", "grid": n, "n_runs": n_runs,
            "value": round(dt, 1), "unit": "sec",
            "a5_bins": mean_rows, "runs_seen": runs_seen,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
