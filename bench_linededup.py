"""Corpus-level line dedup scale probe — linearity + exact-kill
evidence for `text.corpus_line_dedup` (the C4 rule: strike lines
occurring kill_freq+ times corpus-wide).

Synthetic corpus with planted boilerplate: every doc carries one
header line shared by ~10 docs and one footer line shared by ~n/100
docs (both ≥ kill_freq=3 → struck), plus 8 unique md5-derived content
lines (kept). Kill recall must be exact — every doc loses exactly the
2 planted lines — and doubling the corpus must ~double wall-clock
(the plan is posexplode-linear + one line-keyed hash agg + one hash
join + one groupBy rebuild; no corpus² term anywhere).

    SPARK_GRAFT_LINEDEDUP_DOCS=100000,200000,400000 python bench_linededup.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark import cachereg
    from error_analysis_spark.extensions import text as TX
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_LINEDEDUP_DOCS", "100000,200000,400000").split(",")]
    spark = get_spark("bench-linededup")
    results = []
    for n in sizes:
        uniq = (lambda j: F.md5(F.concat(
            F.col("doc_id").cast("string"), F.lit(f":{j}"))))
        header = F.concat(F.lit("HDR "), F.md5(
            (F.col("doc_id") % (n // 10)).cast("string")))
        footer = F.concat(F.lit("FTR "), F.md5(
            (F.col("doc_id") % 100).cast("string")))
        text = F.concat_ws(
            "\n", header, *[uniq(j) for j in range(8)], footer)
        corpus = (spark.range(n).select(F.col("id").alias("doc_id"),
                                        text.alias("text"))
                  .repartition(64).cache())
        corpus.count()
        with cachereg.scoped():
            t0 = time.perf_counter()
            out = TX.corpus_line_dedup(corpus, kill_freq=3).cache()
            # force EVERY output column (incl. the rebuilt text)
            out.agg(F.count(F.xxhash64(*[F.col(c)
                                         for c in out.columns]))).first()
            exact_kills = out.where((F.col("n_lines_removed") == 2)
                                    & (F.col("n_lines_kept") == 8)).count()
            dt = round(time.perf_counter() - t0, 1)
            out.unpersist()
        corpus.unpersist()
        results.append({"docs": n, "sec": dt, "exact_kills": exact_kills,
                        "expect": n})
    print(json.dumps({"metric": "line_dedup_probe", "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
