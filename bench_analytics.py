"""Round-4 analytics-family scale probe — linearity evidence for the
bounded-aggregate operators added in waves 7-13: HLL distinct
(`sketches.hll_distinct`), PSI drift (`curation.distribution_drift`),
grouped OLS trend (`temporal.trend_slope`) and the daily-volume
anomaly z-test (`temporal.anomaly_days`).

Shared scale claim: each collapses the corpus into a table bounded by
groups × a fixed grid (512 registers / 16 bins / 6 moments / days)
via ONE map-side-combinable aggregate, so doubling the rows must
~double wall-clock while the reduce-side key space stays fixed. The
stream is skewed (group 0 holds ~50% of rows) to show none of them
funnel on a hot key.

    SPARK_GRAFT_ANALYTICS_ROWS=2000000,4000000,8000000 \
        python bench_analytics.py
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

    from error_analysis_spark.extensions import curation as CU
    from error_analysis_spark.extensions import sketches as SK
    from error_analysis_spark.operators import temporal as TP
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_ANALYTICS_ROWS",
        "2000000,4000000,8000000").split(",")]
    spark = get_spark("bench-analytics")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    results = []
    for n in sizes:
        u1 = (F.conv(F.substring(F.md5(F.concat(F.lit("g:"),
                                                F.col("id"))), 1, 15),
                     16, 10).cast("long") / F.lit(float(1 << 60)))
        u2 = (F.conv(F.substring(F.md5(F.concat(F.lit("v:"),
                                                F.col("id"))), 1, 15),
                     16, 10).cast("long") / F.lit(float(1 << 60)))
        grp = F.when(u1 < 0.5, F.lit(0)) \
            .otherwise((u1 * 2 * (G - 1)).cast("int") % (G - 1) + 1)
        df = (spark.range(n)
              .select(F.concat(F.lit("s"), grp.cast("string"))
                      .alias("source"),
                      (u2 * 1000).alias("n_chars"),
                      (F.col("id") % 1_000_000).alias("uid"),
                      F.timestamp_seconds(
                          F.lit(1_700_000_000)
                          + (F.col("id") % 90) * 86_400
                          + F.col("id") % 3600).alias("ts"),
                      (u2 * 100).alias("value"))
              .repartition(64).cache())
        df.count()

        t0 = time.perf_counter()
        h = SK.hll_distinct(df, "source", "uid")
        nh = h.count()
        t_h = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        d = CU.distribution_drift(df, group_col="source",
                                  value_col="n_chars")
        nd = d.count()
        t_d = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        tr = TP.trend_slope(df, key_col="source", ts_col="ts",
                            value_col="value")
        nt = tr.count()
        t_t = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        an = TP.anomaly_days(df, key_col="source", ts_col="ts",
                             top_k=10)
        na = an.count()
        t_a = round(time.perf_counter() - t0, 1)

        df.unpersist()
        assert nh == G and nd == G and nt == G and na == 10
        results.append({"rows": n, "hll_sec": t_h, "psi_sec": t_d,
                        "trend_sec": t_t, "anomaly_sec": t_a})
        print(json.dumps(results[-1]))
    print(json.dumps({"metric": "analytics_probe", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
