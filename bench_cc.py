"""Distributed connected-components scale probe (VERDICT r09 #5).

The round-9 vectorized LOCAL path is measured; this probes the
DISTRIBUTED hash-min + pointer-jumping loop — the 100 TB path that
engages above `local_threshold` edges — on a synthetic ~20M-edge graph
whose component structure is known by construction:

- CHAINS: `n_chains` paths of `chain_len` vertices each (edges
  (x, x+1) inside every chain) — the adversarial long-diameter shape
  where plain hash-min needs O(diameter) rounds and pointer jumping
  must deliver its O(log diameter) bound.
- BLOBS: `n_blobs` stars of `blob_size` vertices (edges
  (hub, hub+j)) — the dense near-dup-cluster shape, diameter 2.

Everything is generated with spark.range transformations — no
driver-side edge list — and the probe FORCES the distributed loop via
local_threshold=0. Correctness check: every vertex's component must
equal the minimum id of its chain/blob (one aggregate, zero collect).

    python bench_cc.py                 # ~20M edges
    SPARK_GRAFT_CC_SCALE=0.1 python bench_cc.py   # 2M-edge smoke

Expected iterations: pointer jumping halves the longest pointer chain
each round, so convergence needs ~log2(chain_len) + O(1) rounds; the
probe records the max_iter that sufficed (bisection from above) and
wall time per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions.dedup import connected_components
    from error_analysis_spark.session import get_spark

    scale = float(os.environ.get("SPARK_GRAFT_CC_SCALE", "1.0"))
    n_chains = max(1, int(20 * scale))
    chain_len = 500_000  # diameter stays the hard part at every scale
    n_blobs = max(1, int(100_000 * scale))
    blob_size = 100

    spark = get_spark("bench-cc")
    chain_nodes = n_chains * chain_len
    # chains: vertex x in [0, chain_nodes); chain c owns
    # [c*chain_len, (c+1)*chain_len); edge (x, x+1) except at chain ends
    chains = (spark.range(chain_nodes)
              .where((F.col("id") + 1) % chain_len != 0)
              .select(F.col("id").alias("id_a"),
                      (F.col("id") + 1).alias("id_b")))
    # blobs: hub h owns [base, base+blob_size); star edges (base, base+j)
    base0 = chain_nodes
    blobs = (spark.range(n_blobs * (blob_size - 1))
             .select(
                 (F.lit(base0) + (F.col("id") / (blob_size - 1))
                  .cast("long") * blob_size).alias("id_a"),
                 (F.lit(base0) + (F.col("id") / (blob_size - 1))
                  .cast("long") * blob_size
                  + F.col("id") % (blob_size - 1) + 1).alias("id_b")))
    pairs = chains.unionByName(blobs)
    vertices = spark.range(base0 + n_blobs * blob_size) \
        .select(F.col("id"))
    n_edges = pairs.count()
    print(json.dumps({"edges": n_edges, "chains": n_chains,
                      "chain_len": chain_len, "blobs": n_blobs}),
          flush=True)

    # expected component of vertex v: min id of its chain/blob
    def expected(col):
        return (F.when(col < base0,
                       (col / chain_len).cast("long") * chain_len)
                .otherwise(F.lit(base0)
                           + ((col - base0) / blob_size).cast("long")
                           * blob_size))

    results = []
    for max_iter in (25, 22):
        t0 = time.perf_counter()
        try:
            comp = connected_components(pairs, vertices,
                                        max_iter=max_iter,
                                        local_threshold=0)
            bad = comp.where(
                F.col("component") != expected(F.col("id"))).count()
        except RuntimeError as e:
            # records where the convergence boundary actually sits
            row = {"max_iter": max_iter,
                   "wall_sec": round(time.perf_counter() - t0, 1),
                   "non_convergence": str(e)[:80]}
            results.append(row)
            print(json.dumps(row), flush=True)
            continue
        wall = round(time.perf_counter() - t0, 1)
        row = {"max_iter": max_iter, "wall_sec": wall,
               "wrong_labels": bad}
        results.append(row)
        print(json.dumps(row), flush=True)
        assert bad == 0, f"wrong components: {bad}"

    # loud-failure path: diameter 500k cannot converge in 4 rounds
    # even with pointer jumping (2^4 hops << 500k)
    try:
        connected_components(pairs, vertices, max_iter=4,
                             local_threshold=0) \
            .agg(F.count("*")).collect()
        failure = "MISSED (should have raised)"
    except RuntimeError as e:
        failure = f"raised as designed: {str(e)[:80]}"
    print(json.dumps({"metric": "cc_scale_probe", "edges": n_edges,
                      "runs": results, "non_convergence": failure}))
    spark.stop()


if __name__ == "__main__":
    main()
