"""IVF-PQ persisted-index scale probe — build-vs-query asymmetry and
partition-pruned IO evidence for `ann_store.write_ivfpq_index` /
`query_ivfpq` beyond the tiny embeddings fixture.

Corpus: the bench_pq synthetic (16 planted clusters, 64-dim, one
near-copy of the query planted at id=n). Per size: index build wall
(KMeans cells + residual-PQ codebook train + encode + partitioned
write), query wall at n_probe=2 vs full probe, cluster-level recall of
the top-10, and the pruning ratio (rows scanned by the probe vs corpus
— from the stored cell sizes).

    SPARK_GRAFT_IVFPQ_ROWS=250000,1000000 python bench_ivfpq.py
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _center(c: int, dim: int = 64) -> list[float]:
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{c}_{j}".encode()).hexdigest()[:3]
        out.append(int(h, 16) / 4096.0 - 0.5)
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.session import get_spark
    from error_analysis_spark.sources import ann_store as ANN

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_IVFPQ_ROWS", "250000,1000000").split(",")]
    spark = get_spark("bench-ivfpq")
    dim, n_clusters = 64, 16
    query = _center(3)
    results = []
    for n in sizes:
        cl = F.col("id") % n_clusters
        cexpr = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.conv(F.substring(F.md5(F.concat(
                cl.cast("string"), F.lit("_"), j.cast("string"))), 1, 3),
                16, 10).cast("double") / F.lit(4096.0) - F.lit(0.5)))
        jit = (F.conv(F.substring(F.md5(F.concat(
            F.col("id").cast("string"), F.lit("j"))), 1, 2), 16, 10)
            .cast("double") / F.lit(256.0) - F.lit(0.5)) * F.lit(0.04)
        vec = F.zip_with(cexpr, F.array_repeat(jit, dim),
                         lambda x, y: x + y)
        corpus = (spark.range(n + 1).select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") == n,
                   F.array(*[F.lit(v + 0.001) for v in query]))
            .otherwise(vec).alias("embedding"))
            .repartition(64).cache())
        corpus.count()
        path = tempfile.mkdtemp(prefix="ivfpq_bench_")
        try:
            t0 = time.perf_counter()
            ANN.write_ivfpq_index(corpus, path, n_lists=n_clusters,
                                  seed=7, train_mod=max(1, n // 100_000))
            t1 = time.perf_counter()
            top = ANN.query_ivfpq(spark, path, query, k=10,
                                  n_probe=2).collect()
            t2 = time.perf_counter()
            full = ANN.query_ivfpq(spark, path, query, k=10,
                                   n_probe=n_clusters).collect()
            t3 = time.perf_counter()
            in_cluster = sum(1 for r in top
                             if r["vec_id"] == n
                             or r["vec_id"] % n_clusters == 3)
            cells = {int(r["list_id"]): int(r["n"]) for r in
                     spark.read.parquet(path + "/vectors")
                     .groupBy("list_id").agg(F.count("*").alias("n"))
                     .collect()}
            # the cells the probe actually scanned: same centroid
            # ranking as query_ivfpq
            import numpy as np
            q = np.asarray(query)
            q = q / max(np.linalg.norm(q), 1e-300)
            cents = {int(r["list_id"]): np.asarray(r["center"]) for r in
                     spark.read.parquet(path + "/centroids").collect()}
            probed = sorted(cents, key=lambda i: float(
                ((cents[i] - q) ** 2).sum()))[:2]
            scanned = sum(cells.get(c, 0) for c in probed)
            results.append({
                "rows": n + 1, "build_sec": round(t1 - t0, 2),
                "probe2_sec": round(t2 - t1, 2),
                "full_probe_sec": round(t3 - t2, 2),
                "top10_in_query_cluster": f"{in_cluster}/10",
                "scan_fraction_probe2": round(scanned / (n + 1), 4),
            })
            print(json.dumps(results[-1]))
        finally:
            shutil.rmtree(path, ignore_errors=True)
        corpus.unpersist()
    print(json.dumps({"metric": "ivfpq_probe", "results": results}))


if __name__ == "__main__":
    main()
