"""Benchmark runner — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query choice notes:
- `dedup_jaccard` is excluded from the headline set: the synthetic
  documents share a ~30-word vocabulary, so token-posting joins are
  degenerate at sf0.1 (every doc pairs with every doc). The MinHash
  signature path (`dedup_minhash_sigs`) is the scale-path dedup
  representative; Jaccard correctness is still gated at sf0.01.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "a1_describe_events",
    "a2_zonal_stats",
    "a7_bootstrap_median",
    "a8_rms",
    "j4_variogram_bins",
    "dedup_exact",
    "dedup_minhash_sigs",
    "text_token_stats",
    "text_fingerprint",
    "text_lang_id",
    "sim_cosine_topk",
    "sc4_json_extract",
    "w2_positional_pick",
    "r2_focal_roughness",
    "s8_grid_max",
    "s8_grid_idw",
    "r3_fill_nodata",
    "dedup_simhash",
    "dedup_embedding",
    "sim_pairwise_topk",
    "text_quality",
    "mm_features",
    # round 2 additions — the flagship chain + new oracle-gated operators
    "j1_r4_dod",
    "a13_zone_pixel_counts",
    "sigma_a_zones",
    "sc16_utm_roundtrip",
    "r1_geoid_shift",
    # round 2 wave 2 — completed R3 family, R7 region labeling,
    # Gopher-style repetition signals
    "r3_fill_linear",
    "r7_polygonize",
    "text_repetition",
    "text_bm25_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from error_analysis_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench")
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers with the cheapest query
    qs["a8_rms"](spark, sf_dir).collect()
    # Two passes, report min per query: first-run numbers in local mode are
    # dominated by one-time whole-stage-codegen compilation and JIT warm-up,
    # which a long-lived cluster amortizes away; min-of-2 is the steady state.
    for _pass in range(2):
        for name in HEADLINE:
            if name not in qs:
                continue
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count() if name not in ("sim_cosine_topk",) else len(df.collect())
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            _ = n
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
