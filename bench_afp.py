"""Audio perceptual-dedup scale probe — throughput + planted-recall
evidence for `multimodal.audio_fingerprint` → `afp_near_pairs` beyond
the tiny mm fixture (the bench_phash precedent for the audio modality).

Corpus: n synthetic PCM16 WAV clips (8k samples, a few md5-seeded
sinusoids each — speech-shaped spectra, deterministic bytes), with one
planted near-duplicate partner per 25 clips (30 dB additive noise +
0.9× amplitude re-quantization — the fingerprint's double-difference
signs survive within a few bits). Checks per size:
  - planted recall through the FULL path (WAV encode → real byte
    parse → lag-energy fingerprint → banded Hamming search, radius 8);
  - wall-clock split: the decode+fingerprint Arrow stage
    (corpus-linear, the dominant term at 100 TB) vs the banded pair
    search.

    SPARK_GRAFT_AFP_CLIPS=25000,50000 python bench_afp.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _clip(seed: int, perturb: bool = False):
    """Deterministic synthetic clip per id: 5 sinusoids with md5-seeded
    frequencies/phases. Independent clips land >12 bits apart (measured
    in tests/test_round9_ops.py), so the ONLY near pairs at radius 8
    are the planted noisy partners."""
    import numpy as np
    h = hashlib.md5(f"wav_{seed}".encode()).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    n = 8000
    tt = np.arange(n)
    x = sum(a * np.sin(2 * np.pi * f * tt + p) for a, f, p in zip(
        rng.uniform(0.05, 0.25, 5), rng.uniform(0.001, 0.45, 5),
        rng.uniform(0, 6, 5)))
    if perturb:
        x = x * 0.9 + rng.normal(0, 0.005, n)
    return x


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from error_analysis_spark.extensions import multimodal as MM
    from error_analysis_spark.session import get_spark

    sizes = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_AFP_CLIPS", "25000,50000").split(",")]
    spark = get_spark("bench-afp")
    results = []
    for n in sizes:
        rows = []
        for i in range(n):
            rows.append((i, MM.encode_wav(_clip(i), 1600)))
            if i % 25 == 0:
                rows.append((10_000_000 + i,
                             MM.encode_wav(_clip(i, perturb=True), 1600)))
        pdf = pd.DataFrame(rows, columns=["asset_id", "payload"])
        pdf["kind"] = "audio"
        pdf["sample_rate"] = 1600
        assets = spark.createDataFrame(pdf).repartition(64).cache()
        n_total = assets.count()
        n_planted = sum(1 for i in range(n) if i % 25 == 0)
        t0 = time.perf_counter()
        af = MM.audio_fingerprint(assets).cache()
        af.count()
        t1 = time.perf_counter()
        pairs = MM.afp_near_pairs(af, max_hamming=8)
        planted = pairs.where(
            (F.col("id_b") - F.col("id_a")) == 10_000_000).count()
        n_pairs = pairs.count()
        t2 = time.perf_counter()
        src = dict(af.groupBy("decode_src").count().collect())
        results.append({
            "clips": n_total,
            "fingerprint_sec": round(t1 - t0, 2),
            "clips_per_sec": int(n_total / (t1 - t0)),
            "pair_search_sec": round(t2 - t1, 2),
            "planted_recall": f"{planted}/{n_planted}",
            "pairs_in_radius": n_pairs,
            "decode_src": {k: int(v) for k, v in src.items()},
        })
        print(json.dumps(results[-1]), flush=True)
        af.unpersist()
        assets.unpersist()
    print(json.dumps({"metric": "afp_probe", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
