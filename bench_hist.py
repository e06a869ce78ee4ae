"""Grouped-histogram family scale probe — linearity evidence for the
bounded-fixed-point-histogram selection operators (`curation.domain_cap`,
`sketches.grouped_quantiles`, `sketches.robust_outliers`).

These three share one scale claim: the expensive relational object is
the per-(group, grid-value) COUNT TABLE, bounded by |groups| x grid no
matter the row count, so windows/cutoffs run over the histogram and the
corpus sees only map-side hash aggregation plus (for the selectors) one
broadcast cutoff join. Doubling the rows must ~double wall-clock, and
the per-group output cardinality must stay fixed.

Synthetic stream: md5-derived uniform values over `G` groups with a
deliberately skewed group histogram (group 0 holds ~50% of rows — the
hot-domain case a per-group row_number window would funnel).

    SPARK_GRAFT_HIST_ROWS=2000000,4000000,8000000 python bench_hist.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

G = 20


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import sketches as SK
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_HIST_ROWS", "2000000,4000000,8000000").split(",")]
    spark = get_spark("bench-hist")
    results = []
    for n in sizes:
        u1 = (F.conv(F.substring(F.md5(F.concat(F.lit("g:"),
                                                F.col("id"))), 1, 15),
                     16, 10).cast("long") / F.lit(float(1 << 60)))
        u2 = (F.conv(F.substring(F.md5(F.concat(F.lit("v:"),
                                                F.col("id"))), 1, 15),
                     16, 10).cast("long") / F.lit(float(1 << 60)))
        # skew: u1 < 0.5 → group 0; else uniform over the rest
        grp = F.when(u1 < 0.5, F.lit(0)) \
            .otherwise((u1 * 2 * (G - 1)).cast("int") % (G - 1) + 1)
        df = (spark.range(n)
              .select(grp.alias("g"), (u2 * 100).alias("v"))
              .repartition(64).cache())
        df.count()

        t0 = time.perf_counter()
        q = SK.grouped_quantiles(df, "g", "v", qs=(0.5, 0.9, 0.99),
                                 scale=100)
        nq = q.count()
        t_q = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        o = SK.robust_outliers(df, "g", "v", scale=100)
        no = o.count()
        t_o = round(time.perf_counter() - t0, 1)

        df.unpersist()
        assert nq == 3 * G and no == G
        results.append({"rows": n, "quantiles_sec": t_q,
                        "outliers_sec": t_o})
        print(json.dumps(results[-1]))
    print(json.dumps({"metric": "hist_probe", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
