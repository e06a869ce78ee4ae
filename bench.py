"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints per-query human-readable lines, writes the full per-query
timing map to BENCH_DETAIL.json (repo root), and ends with ONE SHORT
machine-readable JSON line (total + count + sf + the slowest queries):
the driver captures only the stdout TAIL, so the final line must stay
well under its capture window — round 4's single 104-entry line
overflowed it and the formal bench gate got `parsed: null`.

Query choice notes:
- `dedup_jaccard` re-entered the headline set in round 3: the query now
  runs the max_df-pruned candidate+verify path (tokens in >50% of docs
  leave the inverted index; pairs are exactly re-verified), which is
  the form you'd run at scale and is no longer degenerate on the
  shared-vocabulary synthetic corpus.
- `streaming_dedup_ingest` is a wall-clock micro-bench of the
  Structured Streaming exact-dedup stage (file-source micro-batches →
  dropDuplicatesWithinWatermark → noop sink, availableNow), so state
  store growth/regression shows up as time per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The headline set is the full declared registry (packs included —
# each pack times its whole member family in one plan), in declaration
# order. Keeping it dynamic means consolidations and new queries flow
# into the bench without a second roster to maintain; floors in
# BASELINE.md are keyed by the same names.
def headline_queries(qs: dict) -> list[str]:
    return list(qs)


def bench_streaming_dedup(spark, sf_dir: str) -> float:
    """Time the streaming exact-dedup stage over the documents table
    re-shipped as 8 parquet micro-batch files (2 files per trigger,
    availableNow): measures source listing + state-store insert/lookup +
    watermark bookkeeping, not sink IO."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from error_analysis_spark.streaming import dedup as SD

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = (docs.select(
        "doc_id", "text",
        (docs.doc_id % 4).cast("string").alias("source"),
        F.timestamp_seconds(F.lit(1_700_000_000) + docs.doc_id % 3600)
        .alias("ingest_time")))
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    # Round 12 (VERDICT r11 #5, guide §2.2 "fewer, larger partitions"):
    # the stream's dedup state is a few thousand hashes, but the state
    # store inherited the session's core-count-derived shuffle default
    # (32) — 4 triggers × 32 state-store commits of ~150 rows each,
    # pure per-commit overhead, and the reason this extra read FASTER
    # at 8 cores (8 state partitions) than at 32. State partitions are
    # sized to STATE VOLUME, not core count — a production dedup state
    # of billions of hashes sets this high via the env override. A/B
    # (same files, same 2-file triggers, same watermark — ingest
    # semantics identical, every duplicate still crosses trigger
    # boundaries through the state store): warm 4.3-4.4 s at 32 state
    # partitions → 2.0-2.5 s at 8. Documented as an explicit bench
    # measurement change in OPTIMIZATION_r12.md.
    state_parts = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS", "8")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        src.repartition(8).write.mode("overwrite").parquet(tmp + "/in")
        t0 = time.perf_counter()
        spark.conf.set("spark.sql.shuffle.partitions", state_parts)
        stream = SD.stream_documents(spark, tmp + "/in",
                                     max_files_per_trigger=2)
        kept = SD.stream_dedup_exact(stream)
        q = (kept.writeStream.format("noop")
             .option("checkpointLocation", tmp + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return round(time.perf_counter() - t0, 3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from error_analysis_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # Ambient-contention ledger (round 10): this box is a VM, and the
    # funnel's bimodal slow runs were root-caused to guest-kernel
    # system time + hypervisor STEAL, not engine work (BASELINE.md
    # round-10 adjudication: guest user CPU flat 67-101 core-s across
    # 15 identical runs while the 215 s outlier carried system=2133 s
    # + steal=1228 s). Per-query host deltas let the reader of a bench
    # artifact tell a real regression from a contended window.
    host_sys_steal: dict[str, float] = {}
    # Per-query executor TASK-TIME totals (round 12, VERDICT r11 #7):
    # wall-clock core-scaling is unmeasurable on this host (every
    # 32-vCPU run accrues thousands of core-s of hypervisor steal
    # while 8-vCPU runs see ~one tenth of it — ledgers in SCALE_r12.md)
    # — task-seconds are the steal-robust record of how much parallel
    # work a query actually schedules, and a task-time reduction is the
    # scale-relevant effect of an optimization even when wall-clock is
    # fixed-cost-bound at sf0.1. Recorded in BENCH_DETAIL only
    # (additions-only contract).
    task_time: dict[str, float] = {}
    task_cpu: dict[str, float] = {}

    def host_stat() -> dict:
        try:
            with open("/proc/stat") as f:
                p = f.readline().split()
            return {"user": int(p[1]), "system": int(p[3]),
                    "steal": int(p[8])}
        except Exception:
            return {}

    _store = spark._jsparkSession.sparkContext().statusStore()
    _gw = spark.sparkContext._gateway
    _empty = spark._jvm.java.util.Collections.emptyList()
    _darr = _gw.new_array(_gw.jvm.double, 0)

    def task_time_ms() -> int:
        # sum of task RUN times across stages (includes steal/GC —
        # pair with task_cpu_s below to separate work from contention)
        try:
            stages = _store.stageList(_empty, False, False, _darr, _empty)
            return sum(stages.apply(i).executorRunTime()
                       for i in range(stages.size()))
        except Exception:
            return 0

    def task_cpu_ns() -> int:
        # executor CPU nanoseconds across all stages: unlike task
        # DURATION this excludes hypervisor steal / GC / fetch wait,
        # so it is the steal-robust per-query work record
        try:
            stages = _store.stageList(_empty, False, False, _darr, _empty)
            return sum(stages.apply(i).executorCpuTime()
                       for i in range(stages.size()))
        except Exception:
            return 0

    def evaluate(df) -> int:
        """Force evaluation of EVERY output column: count(xxhash64(all
        columns)) — a bare count() lets Catalyst prune unevaluated
        projections, so map-only queries (text_normalize,
        curation_split, layout_zorder, …) degenerated to column-pruned
        scans and the bench overstated their throughput (VERDICT r05).
        xxhash64 is JVM codegen over any column type; its cost is noise
        next to the expressions it forces."""
        from pyspark.sql import functions as F
        return df.agg(F.count(F.xxhash64(*[
            F.col(c) for c in df.columns]))).first()[0]

    # warm the JVM + parquet footers with the cheapest query
    qs["a8_rms"](spark, sf_dir).collect()
    # Two passes, report min per query: first-run numbers in local mode are
    # dominated by one-time whole-stage-codegen compilation and JIT warm-up,
    # which a long-lived cluster amortizes away; min-of-2 is the steady state.
    for _pass in range(2):
        for name in headline_queries(qs):
            if name not in qs:
                continue
            h0 = host_stat()
            tt0 = task_time_ms()
            tc0 = task_cpu_ns()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = (evaluate(df) if name not in ("sim_cosine_topk",)
                 else len(df.collect()))
            dt = round(time.perf_counter() - t0, 3)
            if h0:
                h1 = host_stat()
                ss = round((h1["system"] - h0["system"]
                            + h1["steal"] - h0["steal"]) / 100.0, 1)
                # keep the contamination reading of the pass that
                # produced the reported (min) timing
                if name not in timings or dt <= timings[name]:
                    host_sys_steal[name] = ss
                    task_time[name] = round(
                        (task_time_ms() - tt0) / 1000.0, 1)
                    task_cpu[name] = round(
                        (task_cpu_ns() - tc0) / 1e9, 1)
            timings[name] = min(timings.get(name, dt), dt)
            _ = n
    # one-shot streaming micro-bench (its own checkpoint each run, so
    # min-of-2 double-counts listing; a single availableNow drain is
    # the steady-state shape). Reported SEPARATELY from the headline
    # total (VERDICT r08 #4): as a single unattended wall-clock read
    # dominated by fixed trigger scheduling it swings 0.8→20 s with
    # ambient load and has no per-query floor obligation — letting it
    # into the total let one noisy extra dominate the round-over-round
    # delta. The headline total is now exactly the declared registry.
    extras = {"streaming_dedup_ingest": bench_streaming_dedup(spark, sf_dir)}
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # full per-query map: one human line each + a committed detail file
    for name, dt in timings.items():
        print(f"# {name}: {dt}")
    for name, dt in extras.items():
        print(f"# {name}: {dt} (extra, outside headline total)")
    # Provenance (VERDICT r07 #7): unattended runs (the driver's
    # per-round bench) must not silently shadow the COMMITTED builder
    # detail in place — they write to BENCH_DETAIL_run.json
    # (gitignored) instead. The builder's deliberate floor runs set
    # SPARK_GRAFT_BENCH_SOURCE (e.g. "builder min-of-3, quiesced") and
    # land in BENCH_DETAIL.json; both carry a `source` field.
    src = os.environ.get("SPARK_GRAFT_BENCH_SOURCE")
    detail_name = "BENCH_DETAIL.json" if src else "BENCH_DETAIL_run.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    ambient_total = round(sum(host_sys_steal.values()), 1)
    with open(detail_path, "w") as fh:
        json.dump({"metric": "headline_total_sec", "value": total,
                   "unit": "sec", "sf": sf_val, "n_queries": len(timings),
                   "source": src or "unattended single run "
                   "(not a committed floor)",
                   "queries": timings, "extras": extras,
                   # host system+steal CPU-seconds during each query's
                   # reported pass — ambient-contention evidence, see
                   # BASELINE.md round-10 adjudication
                   "host_sys_steal_s": host_sys_steal,
                   # executor task-seconds (duration) and executor
                   # CPU-seconds during the reported (min) pass — the
                   # CPU figure excludes steal/GC/fetch-wait and is
                   # the steal-robust per-query work record
                   "task_time_s": task_time,
                   "task_cpu_s": task_cpu}, fh,
                  indent=1, sort_keys=True)
    # final machine line LAST (driver tail-captures stdout): total +
    # count + sf + the 5 slowest queries in `queries` (unchanged shape,
    # round-over-round comparable) PLUS — round 12, VERDICT r11 #2 —
    # `detail_inline`, the COMPLETE per-query map at 2-decimal
    # precision, so the PERF comparator sees all ~102 names instead of
    # 4 common ones and never mislabels a top-5 dropout as
    # "dropped_from_bench". Additions-only; the whole line measures
    # ~3.0 KB (round 4's overflow line carried full-precision floats —
    # the r11 driver tail held 3.6 KB, so this stays inside the
    # capture window, and `queries`/3-decimal detail stay available in
    # BENCH_DETAIL*.json).
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf_val,
        "n_queries": len(timings),
        "extras": extras,
        "ambient_sys_steal_s": ambient_total,
        "detail": detail_name,
        "detail_inline": {k: round(v, 2) for k, v in timings.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
