"""Image perceptual-dedup scale probe — throughput + planted-recall
evidence for `multimodal.image_phash` → `phash_near_pairs` beyond the
tiny mm fixture.

Corpus: n synthetic PPM images (tiny 16×24 gradient tiles whose
parameters derive from md5(asset_id), so every byte is deterministic),
with one planted near-duplicate partner per 25 images (a few gently
perturbed pixels — most of the 8×9 sample-grid gradient comparisons
survive, so the pair lands within Hamming ≤ 6). Checks per size:
  - planted recall through the FULL path (PPM encode → real byte
    decode → dHash → banded Hamming search);
  - wall-clock split: the decode+hash Arrow stage (corpus-linear, the
    dominant term at 100 TB) vs the banded pair search.

    SPARK_GRAFT_PHASH_IMGS=25000,50000 python bench_phash.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tile(seed: int, perturb: bool = False):
    """Deterministic white-noise tile per id — independent tiles hash
    to independent 64-bit dHashes (random pairs within Hamming 6 have
    ~1e-11 probability each), so the ONLY near pairs are the planted
    perturbed partners (2 pixels nudged → ≤4 sampled-gradient flips)."""
    import numpy as np
    h = hashlib.md5(f"img_{seed}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    img = rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
    if perturb:
        for _ in range(2):
            y, x = rng.integers(0, 16), rng.integers(0, 24)
            img[y, x] = np.clip(int(img[y, x]) + 20, 0, 255)
    return np.stack([img, img, img], axis=2)


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import multimodal as MM
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_PHASH_IMGS", "25000,50000").split(",")]
    spark = get_spark("bench-phash")
    results = []
    for n in sizes:
        # build payload bytes driver-side in chunks (deterministic),
        # parallelize as a DataFrame — the probe measures the ENGINE
        # stages, not fixture construction
        rows = []
        for i in range(n):
            rows.append((i, MM.encode_ppm(_tile(i))))
            if i % 25 == 0:
                rows.append((10_000_000 + i,
                             MM.encode_ppm(_tile(i, perturb=True))))
        pdf = pd.DataFrame(rows, columns=["asset_id", "payload"])
        pdf["kind"] = "image"
        pdf["width"] = 24
        pdf["height"] = 16
        assets = spark.createDataFrame(pdf).repartition(64).cache()
        n_total = assets.count()
        t0 = time.perf_counter()
        ph = MM.image_phash(assets).cache()
        ph.count()
        t1 = time.perf_counter()
        pairs = MM.phash_near_pairs(ph, max_hamming=6)
        planted = pairs.where(
            (F.col("id_b") - F.col("id_a")) == 10_000_000).count()
        n_pairs = pairs.count()
        t2 = time.perf_counter()
        expected = len([r for r in rows if r[0] >= 10_000_000])
        results.append({
            "images": n_total, "hash_sec": round(t1 - t0, 2),
            "pairs_sec": round(t2 - t1, 2), "n_pairs": n_pairs,
            "planted_found": planted, "planted_expected": expected,
        })
        print(json.dumps(results[-1]))
        ph.unpersist()
        assets.unpersist()
    print(json.dumps({"metric": "phash_probe", "results": results}))


if __name__ == "__main__":
    main()
