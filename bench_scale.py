"""Opt-in larger-scale spot bench (round 12, VERDICT r11 #7).

The sf0.1 driver bench is per-invocation-overhead-bound — the r11
scaling block measured c8 ≈ c32 on every heavy query, so wall-clock at
that SF can no longer distinguish a 100 TB-relevant optimization from
plan-cost shaving. This script builds a deterministic ×SCALE corpus
under /tmp and times the heavy LLM-pipeline queries there at the
invoking core count; running it at SPARK_GRAFT_CPUS=32 and =8 yields
the core-scaling evidence (committed as SCALE_r12.md / SCALE_r12.json).

Corpus construction (linear, not quadratic, work growth — the point is
to measure the ENGINE's scaling, not to square the near-dup graph):

- documents ×SCALE: copy k shifts doc_id by k·1_000_000 and SALTS every
  token with an alphabetic per-copy suffix (regexp "(\\S+)" → "$1zk").
  Token vocabularies are disjoint across copies, so every near-dup /
  contamination / LSH structure is reproduced WITHIN each copy and the
  pair/candidate volume grows ~linearly with SCALE (identical texts
  across copies would grow it quadratically and measure the data, not
  the engine).
- embeddings ×SCALE: copy k flips each dimension's sign by a
  deterministic md5-parity mask. Within a copy, every pairwise cosine
  is EXACTLY the original (cos(v⊙s, w⊙s) = cos(v, w)), so the kNN /
  near-dup structure replicates per copy; across copies the masked
  cosines scatter around 0 and stay below the operators' thresholds
  except for a bounded tail.
- every other table is symlinked unchanged.

The build is pure PyArrow/NumPy (no Spark), deterministic, and rebuilt
from /root/testdata on every run — nothing is cached across runs and
the driver bench (bench.py) is untouched.

Usage:
    SPARK_GRAFT_CPUS=32 python bench_scale.py [--scale 8] [--runs 2]

Prints one JSON line: {"cpus": C, "scale": S, "n_docs": N,
"queries": {name: min_sec}, "ambient_sys_steal_s": ...}.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 1_000_000

# dedup_jaccard is deliberately NOT in the scale set: its fractional
# max_df prune is corpus-relative (tokens in > 50% of docs leave the
# inverted index), and the synthetic sf0.1 vocabulary is 31 tokens ALL
# at ~78% df — every copy-salting scheme halves each df FRACTION per
# corpus doubling, un-prunes the entire stopword set, and the posting
# self-join goes quadratic in the DATA (measured 245 s at scale 2),
# which measures the degenerate vocabulary, not the engine. Its
# candidate+verify kernels are covered at scale by curation_funnel and
# sim_pair_pack's dedup_minhash_lsh member (MinHash banding carries no
# df prune, and salted copies keep its pair volume linear).
SCALE_QUERIES = [
    "curation_funnel", "sim_pair_pack", "text_doc_pack", "mm_pack",
    "contam_chunk_pack", "text_bigram_ppl", "dedup_cluster_pack",
    "text_contam_bloom",
]


def build_corpus(scale: int, out_dir: str, emb_scale: int | None = None
                 ) -> int:
    """Deterministic ×scale documents/embeddings under out_dir; other
    tables symlinked. Returns the scaled document count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))

    tok_re = re.compile(r"(\S+)")
    doc_chunks = []
    for k in range(scale):
        ids = np.asarray(docs["doc_id"]) + k * OFFSET
        if k == 0:
            texts = docs["text"]
        else:
            salt = "z" + chr(ord("a") + (k - 1) % 26)
            texts = pa.array(
                [None if t is None else tok_re.sub(r"\g<1>" + salt, t)
                 for t in docs["text"].to_pylist()])
        doc_chunks.append(pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": texts,
            "lang": docs["lang"], "source": docs["source"],
            "n_chars": docs["n_chars"]}))
    big_docs = pa.concat_tables(doc_chunks)
    # many row groups → the scans split across cores like a real table
    pq.write_table(big_docs, os.path.join(out_dir, "documents.parquet"),
                   row_group_size=2048)

    vecs = np.stack([np.asarray(v, dtype=np.float32)
                     for v in emb["embedding"].to_pylist()])
    dim = vecs.shape[1]
    emb_chunks = []
    # embeddings may scale separately: the exact all-pairs GEMM members
    # are quadratic in rows BY DESIGN, so doc-side scaling can go much
    # further than vector-side scaling in one bounded run
    for k in range(emb_scale if emb_scale is not None else scale):
        if k == 0:
            m = vecs
        else:
            mask = np.asarray([
                1.0 if int(hashlib.md5(f"{k}_{i}".encode())
                           .hexdigest()[:8], 16) % 2 == 0 else -1.0
                for i in range(dim)], dtype=np.float32)
            m = vecs * mask
        emb_chunks.append(pa.table({
            "vec_id": pa.array(np.asarray(emb["vec_id"]) + k * OFFSET,
                               type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
            "label": emb["label"]}))
    pq.write_table(pa.concat_tables(emb_chunks),
                   os.path.join(out_dir, "embeddings.parquet"),
                   row_group_size=1024)

    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in ("documents.parquet",
                                                "embeddings.parquet"):
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, f), dst)
    return big_docs.num_rows


def main() -> None:
    args = sys.argv[1:]
    scale, runs = 8, 2
    emb_scale: int | None = None
    i = 0
    while i < len(args):
        if args[i] == "--scale":
            scale = int(args[i + 1]); i += 2
        elif args[i] == "--emb-scale":
            emb_scale = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            i += 1

    out_dir = f"/tmp/spark_graft_scale{scale}"
    shutil.rmtree(out_dir, ignore_errors=True)
    n_docs = build_corpus(scale, out_dir, emb_scale)

    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from error_analysis_spark.session import get_spark

    spark = get_spark("bench_scale")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    qs = entry_mod.queries()
    qs["a8_rms"](spark, out_dir).collect()  # JVM warm-up

    def host_stat():
        with open("/proc/stat") as f:
            p = f.readline().split()
        return int(p[3]) + int(p[8])

    _store = spark._jsparkSession.sparkContext().statusStore()
    _gw = spark.sparkContext._gateway
    _empty = spark._jvm.java.util.Collections.emptyList()
    _darr = _gw.new_array(_gw.jvm.double, 0)

    def task_time_ms() -> int:
        # sum of task RUN times across stages (includes steal/GC —
        # pair with task_cpu_s to separate work from contention)
        stages = _store.stageList(_empty, False, False, _darr, _empty)
        return sum(stages.apply(i).executorRunTime()
                   for i in range(stages.size()))

    def task_cpu_ns() -> int:
        # executor CPU ns across stages — excludes steal/GC/fetch wait
        stages = _store.stageList(_empty, False, False, _darr, _empty)
        return sum(stages.apply(i).executorCpuTime()
                   for i in range(stages.size()))

    def evaluate(df) -> int:
        return df.agg(F.count(F.xxhash64(*[
            F.col(c) for c in df.columns]))).first()[0]

    timings: dict[str, float] = {}
    # executor task-seconds per query (min pass): the steal-robust
    # record of parallel work — wall-clock core ratios are meaningless
    # on a host whose hypervisor steals ~half the vCPUs of every wide
    # run (ledgers in SCALE_r12.md), but task-seconds measure the work
    # the engine actually schedules regardless of steal
    task_time: dict[str, float] = {}
    task_cpu: dict[str, float] = {}
    ss0 = host_stat()
    for name in SCALE_QUERIES:
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"scale:{name}:run{r}")
            tt0 = task_time_ms()
            tc0 = task_cpu_ns()
            t0 = time.perf_counter()
            evaluate(qs[name](spark, out_dir))
            dt = round(time.perf_counter() - t0, 3)
            if name not in timings or dt <= timings[name]:
                task_time[name] = round((task_time_ms() - tt0) / 1000.0, 1)
                task_cpu[name] = round((task_cpu_ns() - tc0) / 1e9, 1)
            timings[name] = min(timings.get(name, dt), dt)
            print(f"# {name} run{r}: {dt}", flush=True)
    ambient = round((host_stat() - ss0) / 100.0, 1)
    print(json.dumps({"cpus": cpus, "scale": scale,
                      "emb_scale": emb_scale or scale, "n_docs": n_docs,
                      "total_min_sec": round(sum(timings.values()), 3),
                      "queries": timings, "task_time_s": task_time,
                      "task_cpu_s": task_cpu,
                      "ambient_sys_steal_s": ambient}))
    spark.stop()
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
