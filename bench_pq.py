"""Product-quantization scale probe — throughput linearity + recall
evidence for `similarity.pq_train` / `pq_topk` beyond the tiny
embeddings table.

Corpus: n synthetic 64-dim vectors in 16 planted clusters (center c =
md5-derived pattern, ±0.02 jitter) plus one planted near-copy of the
query vector. Checks per size:
  - the planted near-copy ranks #1 by ADC (cluster structure is what
    PQ is FOR — unlike the uniform-random sf tables, recall here must
    be high);
  - wall-clock for train vs encode+rank separately — encode is the
    corpus-linear part (the Arrow int64-einsum kernel), train is
    sample-bounded (train_mod keeps the Lloyd pass at ~100k rows
    regardless of corpus size, the 100 TB shape).

    SPARK_GRAFT_PQ_ROWS=250000,500000,1000000 python bench_pq.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import similarity as S
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_PQ_ROWS", "250000,500000,1000000").split(",")]
    spark = get_spark("bench-pq")
    results = []
    # query = center of cluster 3, exactly
    dim, n_clusters = 64, 16

    def center_expr(cl):
        # deterministic per (cluster, dim) value in [-0.5, 0.5):
        # md5-derived 3 hex digits / 4096 - 0.5
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.conv(F.substring(F.md5(F.concat(
                cl.cast("string"), F.lit("_"), j.cast("string"))), 1, 3),
                16, 10).cast("double") / F.lit(4096.0) - F.lit(0.5)))

    import hashlib

    def center_py(c):
        out = []
        for j in range(dim):
            h = hashlib.md5(f"{c}_{j}".encode()).hexdigest()[:3]
            out.append(int(h, 16) / 4096.0 - 0.5)
        return out

    query = center_py(3)
    for n in sizes:
        cl = F.col("id") % n_clusters
        jit = (F.conv(F.substring(F.md5(F.concat(
            F.col("id").cast("string"), F.lit("j"))), 1, 2), 16, 10)
            .cast("double") / F.lit(256.0) - F.lit(0.5)) * F.lit(0.04)
        vec = F.zip_with(center_expr(cl),
                         F.array_repeat(jit, dim), lambda x, y: x + y)
        # planted near-copy of the query at id = n (tiny fixed offset)
        corpus = (spark.range(n + 1).select(
            F.col("id").alias("vec_id"),
            F.when(F.col("id") == n,
                   F.array(*[F.lit(v + 0.001) for v in query]))
            .otherwise(vec).alias("embedding"))
            .repartition(64).cache())
        corpus.count()
        train_mod = max(1, n // 100_000)
        t0 = time.perf_counter()
        book = S.pq_train(corpus, train_mod=train_mod)
        t1 = time.perf_counter()
        out = S.pq_topk(corpus, query, book, k=10).collect()
        t2 = time.perf_counter()
        top = [r for r in out if r["part"] == "topk"]
        # ADC cannot rank WITHIN a code (every member of the chosen
        # centroid ties — that is PQ's residual error by design), so
        # the recall contract is cluster-level: all top-k must be
        # members of the query's cluster (id % 16 == 3) or the planted
        # near-copy itself
        in_cluster = sum(1 for r in top
                         if r["j"] == n or r["j"] % n_clusters == 3)
        results.append({
            "rows": n, "train_mod": train_mod,
            "train_sec": round(t1 - t0, 2),
            "encode_rank_sec": round(t2 - t1, 2),
            "topk_in_query_cluster": f"{in_cluster}/{len(top)}",
        })
        print(json.dumps(results[-1]))
        corpus.unpersist()
    print(json.dumps({"metric": "pq_probe", "results": results}))


if __name__ == "__main__":
    main()
