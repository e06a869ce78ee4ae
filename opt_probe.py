"""Optimization probe: time declared queries in isolation and
capture their formatted plans.

Usage:
    python opt_probe.py [--plans DIR_SUFFIX] [--round rNN] [--runs N] [query ...]

Times each named query (default: all declared) with the SAME evaluate()
methodology as bench.py (count(xxhash64(*)) — forces every output
column), in THIS session, `--runs` times, printing each run plus the
min. With `--plans before` also writes `.explain("formatted")` output
to plans/<round>/<query>_<suffix>.txt (round defaults to r12). A fresh
session per invocation, so first-run numbers include codegen warmup
exactly like a driver run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = sys.argv[1:]
    plans_suffix = None
    round_dir = "r12"
    runs = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif args[i] == "--round":
            round_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from error_analysis_spark.session import get_spark

    spark = get_spark("opt_probe")
    qs = entry_mod.queries()
    if not names:
        names = list(qs)

    def evaluate(df) -> int:
        return df.agg(F.count(F.xxhash64(*[
            F.col(c) for c in df.columns]))).first()[0]

    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", round_dir)
    os.makedirs(plans_dir, exist_ok=True)

    # warm the JVM once (same as bench.py)
    qs["a8_rms"](spark, sf_dir).collect()

    def job_stats():
        """(n_jobs, n_stages) submitted so far — deterministic plan-
        shape evidence immune to the host's ambient-contention noise."""
        tracker = spark.sparkContext._jsc.sc().statusTracker()
        jids = tracker.getJobIdsForGroup(None)
        n_stages = 0
        for j in jids:
            info = tracker.getJobInfo(j)
            if info.nonEmpty():
                n_stages += len(info.get().stageIds())
        return len(jids), n_stages

    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}")
            continue
        ts = []
        j0, s0 = job_stats()
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"probe:{name}:run{r}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = (evaluate(df) if name not in ("sim_cosine_topk",)
                 else len(df.collect()))
            ts.append(round(time.perf_counter() - t0, 3))
            _ = n
            if r == 0:
                j1, s1 = job_stats()
        if plans_suffix:
            df = qs[name](spark, sf_dir)
            path = os.path.join(plans_dir, f"{name}_{plans_suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"## {name}: runs={ts} min={min(ts)} "
              f"jobs={j1 - j0} stages={s1 - s0}")
    spark.stop()


if __name__ == "__main__":
    main()
