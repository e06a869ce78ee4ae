"""Standalone per-query floor/adjudication runner — ONE session, n
runs of the named queries with bench-identical evaluation
(count(xxhash64(*cols)) through the cache-releasing `queries()`
wrapper). The documented protocol (BASELINE.md round-7) is THREE
separate invocations of this script on an idle machine, min across
sessions:

    python bench_standalone.py text_contam_bloom            # n=4
    SPARK_GRAFT_STANDALONE_N=6 python bench_standalone.py q1 q2

Prints one JSON line per query: all readings + the session min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: bench_standalone.py <query> [query ...]")
    n = int(os.environ.get("SPARK_GRAFT_STANDALONE_N", "4"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from error_analysis_spark.session import get_spark

    spark = get_spark("bench-standalone")
    qs = entry_mod.queries()
    # same warm-up as bench.py: JVM + parquet footers
    qs["a8_rms"](spark, sf_dir).collect()
    for name in names:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.agg(F.count(F.xxhash64(*[
                F.col(c) for c in df.columns]))).first()
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"query": name, "runs": runs,
                          "min": min(runs), "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
