"""Adversarial ANN recall probe (VERDICT r08 #6) — overlapping Gaussian
mixtures instead of the 16 well-separated planted clusters of
bench_pq/bench_ivfpq, where recall 10/10 was near-guaranteed by
construction. Here 64 cluster centers ~ N(0, I) with per-point noise
σ = 1.0 — the same order as the centroid spacing — so cell boundaries
cut through real probability mass and the recall knobs (PQ codebook
size, IVF n_probe) must actually earn their recall.

Measures, against exact numpy baselines in each method's own metric:
- PQ ADC recall@10 vs n_codes (16 / 64 / 256) — exact = raw-vector L2.
- IVF-PQ recall@10 vs n_probe (1..64 of 64 lists) — exact = unit-vector
  L2 (≡ cosine order).

    SPARK_GRAFT_ANN_ROWS=200000 python bench_ann_recall.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import pandas as pd

    from error_analysis_spark.session import get_spark
    from error_analysis_spark.extensions import similarity as S
    from error_analysis_spark.sources import ann_store as ANN

    n = int(os.environ.get("SPARK_GRAFT_ANN_ROWS", "200000"))
    dim, n_clusters, n_queries, k = 64, 64, 8, 10
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((n_clusters, dim))
    X = (centers[rng.integers(0, n_clusters, n)]
         + rng.standard_normal((n, dim)) * 1.0).astype(np.float64)
    queries = (centers[rng.integers(0, n_clusters, n_queries)]
               + rng.standard_normal((n_queries, dim)) * 1.0)

    spark = get_spark("bench-ann-recall")
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(X)})).repartition(32).cache()
    emb.count()

    # ---- exact baselines (numpy GEMM — the ground truth) ----
    def exact_l2_topk(Y, q):
        d = ((Y - q) ** 2).sum(1)
        return set(np.argsort(d, kind="stable")[:k].tolist())

    U = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
    results: dict = {"rows": n, "dim": dim, "clusters": n_clusters,
                     "sigma_over_spacing": "~0.7 (σ=1, E‖ci−cj‖≈√(2d))"}

    # ---- PQ: recall@10 vs n_codes (full-corpus ADC scan) ----
    # (grid mode runs ONLY the round-10 n_lists/codebook grid below)
    grid_only = os.environ.get("SPARK_GRAFT_ANN_GRID") == "1"
    pq_curve = []
    for n_codes in () if grid_only else (16, 64, 256):
        book = S.pq_train(emb, n_blocks=8, n_codes=n_codes,
                          train_mod=max(1, n // 100_000))
        hits, hits_rr, t_scan = 0, 0, 0.0
        for q in queries:
            truth = exact_l2_topk(X, q)
            t0 = time.perf_counter()
            # one k=100 scan serves both measurements: plain ADC top-10
            # and the exact-reranked shortlist (pq_topk already returns
            # each row's TRUE distance in `m`, so reranking is free)
            top = S.pq_topk(emb, [float(v) for v in q], book, k=100) \
                .where("part = 'topk'").collect()
            t_scan += time.perf_counter() - t0
            adc10 = sorted(top, key=lambda r: (r["v"], r["j"]))[:k]
            hits += len(truth & {int(r["j"]) for r in adc10})
            rr10 = sorted(top, key=lambda r: (r["m"], r["j"]))[:k]
            hits_rr += len(truth & {int(r["j"]) for r in rr10})
        pq_curve.append({"n_codes": n_codes,
                         "recall_at_10": round(hits / (k * n_queries), 3),
                         "recall_at_10_rerank100":
                         round(hits_rr / (k * n_queries), 3),
                         "scan_sec_per_query": round(t_scan / n_queries, 2)})
        print(json.dumps({"pq": pq_curve[-1]}), flush=True)
    results["pq_recall_vs_n_codes"] = pq_curve

    # ---- IVF-PQ: recall@10 vs n_probe (pruned probes) ----
    path = tempfile.mkdtemp(prefix="ann_recall_ivfpq_")
    try:
        t0 = time.perf_counter()
        if grid_only:
            raise StopIteration  # skip to the grid (finally cleans up)
        ANN.write_ivfpq_index(emb, path, n_lists=n_clusters, n_blocks=8,
                              n_codes=64, seed=7,
                              train_mod=max(1, n // 100_000))
        build = round(time.perf_counter() - t0, 2)
        ivf_curve = []
        for n_probe in (1, 2, 4, 8, 16, 64):
            hits, hits_rr = 0, 0
            for q in queries:
                truth = exact_l2_topk(
                    U, q / max(np.linalg.norm(q), 1e-300))
                top = ANN.query_ivfpq(spark, path, [float(v) for v in q],
                                      k=k, n_probe=n_probe).collect()
                hits += len(truth & {int(r["vec_id"]) for r in top})
                rr = ANN.query_ivfpq(spark, path, [float(v) for v in q],
                                     k=k, n_probe=n_probe,
                                     rerank_source=emb,
                                     shortlist=100).collect()
                hits_rr += len(truth & {int(r["vec_id"]) for r in rr})
            ivf_curve.append({"n_probe": n_probe,
                              "recall_at_10":
                              round(hits / (k * n_queries), 3),
                              "recall_at_10_rerank100":
                              round(hits_rr / (k * n_queries), 3)})
            print(json.dumps({"ivfpq": ivf_curve[-1]}), flush=True)
        results["ivfpq_build_sec"] = build
        results["ivfpq_recall_vs_n_probe"] = ivf_curve
    except StopIteration:
        pass
    finally:
        shutil.rmtree(path, ignore_errors=True)
    if not grid_only:
        print(json.dumps({"metric": "ann_recall_probe",
                          "results": results}))

    # ---- round-10 grid (VERDICT r09 #4): is list count or probe count
    # the binding knob on σ≈spacing mixtures? Sweep n_lists at a fixed
    # codebook, then codebook size at a fixed n_lists, recording the
    # SCANNED FRACTION next to each recall so the recall/IO trade is
    # explicit. Enabled with SPARK_GRAFT_ANN_GRID=1.
    if os.environ.get("SPARK_GRAFT_ANN_GRID") == "1":
        grid = []
        configs = (
            # (n_lists, n_blocks, n_codes) — n_lists sweep first
            (64, 8, 256), (256, 8, 256), (1024, 8, 256),
            # codebook sweep at the middle n_lists
            (256, 8, 64), (256, 16, 256),
        )
        for n_lists, n_blocks, n_codes in configs:
            path = tempfile.mkdtemp(prefix="ann_grid_")
            try:
                t0 = time.perf_counter()
                ANN.write_ivfpq_index(
                    emb, path, n_lists=n_lists, n_blocks=n_blocks,
                    n_codes=n_codes, seed=7,
                    train_mod=max(1, n // 100_000))
                build = round(time.perf_counter() - t0, 2)
                rows_per_list = {
                    int(r["list_id"]): int(r["cnt"])
                    for r in spark.read.parquet(
                        os.path.join(path, "vectors"))
                    .groupBy("list_id").count()
                    .withColumnRenamed("count", "cnt").collect()}
                cents = {int(r["list_id"]): np.asarray(r["center"])
                         for r in spark.read.parquet(
                             os.path.join(path, "centroids")).collect()}
                for n_probe in (1, 4, 16):
                    hits, hits_rr, hits_rr1k, scanned = 0, 0, 0, 0
                    for q in queries:
                        u = q / max(np.linalg.norm(q), 1e-300)
                        truth = exact_l2_topk(U, u)
                        probe = sorted(
                            cents, key=lambda i: float(
                                ((cents[i] - u) ** 2).sum()))[:n_probe]
                        scanned += sum(rows_per_list.get(p, 0)
                                       for p in probe)
                        top = ANN.query_ivfpq(
                            spark, path, [float(v) for v in q], k=k,
                            n_probe=n_probe).collect()
                        hits += len(truth & {int(r["vec_id"])
                                             for r in top})
                        rr = ANN.query_ivfpq(
                            spark, path, [float(v) for v in q], k=k,
                            n_probe=n_probe, rerank_source=emb,
                            shortlist=100).collect()
                        hits_rr += len(truth & {int(r["vec_id"])
                                                for r in rr})
                        rr1k = ANN.query_ivfpq(
                            spark, path, [float(v) for v in q], k=k,
                            n_probe=n_probe, rerank_source=emb,
                            shortlist=1000).collect()
                        hits_rr1k += len(truth & {int(r["vec_id"])
                                                  for r in rr1k})
                    row = {"n_lists": n_lists, "codebook":
                           f"{n_blocks}x{n_codes}", "n_probe": n_probe,
                           "build_sec": build,
                           "scan_frac": round(
                               scanned / (n * n_queries), 4),
                           "recall_at_10":
                           round(hits / (k * n_queries), 3),
                           "recall_rr100":
                           round(hits_rr / (k * n_queries), 3),
                           "recall_rr1000":
                           round(hits_rr1k / (k * n_queries), 3)}
                    grid.append(row)
                    print(json.dumps({"grid": row}), flush=True)
            finally:
                shutil.rmtree(path, ignore_errors=True)
        print(json.dumps({"metric": "ann_recall_grid", "grid": grid}))
    spark.stop()


if __name__ == "__main__":
    main()
