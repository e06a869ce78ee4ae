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

    def host_stat() -> dict:
        """Aggregate /proc/stat jiffies. Round-10 adjudication
        instrument: this box is a VM and the funnel's bimodal runs
        were root-caused to AMBIENT contention, not engine work —
        probe evidence (BASELINE.md round-10): across 15 identical
        verify runs, guest USER cpu was flat (67-101 core-s) while
        the 215 s outlier carried system=2133 s + steal=1228 s.
        Recording per-run host deltas lets a floor adjudication
        separate 'the engine got slower' from 'the host was busy'."""
        try:
            with open("/proc/stat") as f:
                p = f.readline().split()
            return {"user": int(p[1]), "system": int(p[3]),
                    "idle": int(p[4]), "steal": int(p[8])}
        except Exception:
            return {}

    def codegen_metrics() -> dict:
        """Snapshot the JVM-wide janino codegen counters (round 10,
        VERDICT r09 #2 instrumentation): per-run DELTAS of these
        separate 'paid codegen compile time again' from 'the same
        generated classes were reused' — the discriminator for the
        funnel's bimodal runs. Histogram sums aren't exposed, so
        compile time is approximated as count × reservoir mean; the
        max generated METHOD bytecode is the HotSpot-JIT-refusal
        signal (DontCompileHugeMethods kicks in at 8000 bytecodes:
        a method between 8000 and Spark's 65535 hugeMethodLimit gets
        codegen'd but runs INTERPRETED forever)."""
        try:
            cm = getattr(getattr(
                spark._jvm,
                "org.apache.spark.metrics.source.CodegenMetrics$"),
                "MODULE$")
            ct = cm.METRIC_COMPILATION_TIME()
            mb = cm.METRIC_GENERATED_METHOD_BYTECODE_SIZE()
            out = {
                "compile_count": ct.getCount(),
                "compile_ms_mean": round(ct.getSnapshot().getMean(), 1),
                "max_method_bytecode": mb.getSnapshot().getMax(),
            }
            # HotSpot code-cache occupancy: when the cache fills, the
            # JIT is DISABLED for new methods and fresh janino classes
            # run interpreted — a 10-30× kernel slowdown that appears
            # MID-session, matching the funnel's bimodal runs
            mf = spark._jvm.java.lang.management.ManagementFactory
            used = total = 0
            it = mf.getMemoryPoolMXBeans().iterator()
            while it.hasNext():
                pool = it.next()
                if "CodeHeap" in pool.getName() \
                        or "Code Cache" in pool.getName():
                    u = pool.getUsage()
                    used += u.getUsed()
                    total += u.getMax()
            if total:
                out["code_cache_used_mb"] = round(used / 2**20, 1)
                out["code_cache_max_mb"] = round(total / 2**20, 1)
            return out
        except Exception:
            return {}

    qs = entry_mod.queries()
    # same warm-up as bench.py: JVM + parquet footers
    qs["a8_rms"](spark, sf_dir).collect()
    for name in names:
        runs, cg, host = [], [], []
        for _ in range(n):
            before = codegen_metrics()
            h0 = host_stat()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.agg(F.count(F.xxhash64(*[
                F.col(c) for c in df.columns]))).first()
            runs.append(round(time.perf_counter() - t0, 3))
            h1 = host_stat()
            after = codegen_metrics()
            if h0 and h1:
                host.append({k: round((h1[k] - h0[k]) / 100.0, 1)
                             for k in h0})
            if after:
                d_count = after["compile_count"] - before.get(
                    "compile_count", 0)
                cg.append({
                    "compiles": d_count,
                    "est_compile_s": round(
                        d_count * after["compile_ms_mean"] / 1000.0, 2),
                    "max_method_bytecode": after["max_method_bytecode"],
                })
        rec = {"query": name, "runs": runs,
               "min": min(runs), "sf_dir": sf_dir}
        if host:
            rec["host_cpu_s"] = host
        if cg:
            rec["codegen"] = cg
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
