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
    "r2_focal_all",
    "s8_grid_max",
    "s8_grid_idw",
    "r3_fill_all",
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
    # round 2 wave 2 — R7 region labeling, Gopher-style repetition
    # signals (the four R3 fills now run consolidated as r3_fill_all)
    "r7_polygonize",
    "text_repetition",
    "text_bm25_topk",
    # round 3 — oracle-gated uncertainty estimators + pruned jaccard;
    # dedup_minhash_lsh tracks the row-local signature+banding plan
    "sigma_a_brute",
    "sigma_a_hugonnet",
    "dedup_jaccard",
    "dedup_minhash_lsh",
    # round 3 wave 2 — data-mixing layer (map-side stratified sampling,
    # two-phase-prefix-scan training order and concat-and-chunk packing)
    "curation_sample_mix",
    "curation_pack_chunks",
    "sketch_kmv_distinct",
    "text_vocab_topk",
    "emb_quantize_stats",
    "sim_lsh_topk",
    "w4_sessionize",
    "j10_asof_join",
    # round 3 wave 3 — dup-ngram coverage (suffix-array-dedup stand-in),
    # RAG chunking, DoReMi-lite domain mixing weights
    "text_dup_ngrams",
    "text_chunk_windows",
    "curation_domain_weights",
    "curation_quality_prune",
    "dedup_incremental",
    "curation_weighted_sample",
    "emb_label_centroids",
    "text_perplexity",
    # round 4 — normalization map stage, vocab-coverage probe,
    # Bloom-bitset decontamination (row-local corpus probe), per-domain
    # cap via grouped histogram
    "text_normalize",
    "text_oov_rate",
    "text_contam_bloom",
    "curation_domain_cap",
    "w5_rolling_stats",
    "sketch_grouped_quantiles",
    "q03_top_orders",
    # round 4 wave 2 — holdout split, padding-waste buckets, CMS audit,
    # JL projection, snapshot diff, robust MAD outliers
    "curation_split",
    "curation_length_buckets",
    "sketch_cms_err",
    "emb_random_projection",
    "curation_snapshot_diff",
    "w6_outlier_mad",
    # round 4 wave 3 — bigram LM scoring, Gram/covariance pass,
    # dataset card, conversion funnel, cohort retention
    "text_bigram_ppl",
    "emb_covariance",
    "curation_data_card",
    "w7_funnel",
    "w8_retention",
    # round 4 wave 4 — six-table analytic join, per-doc keywords
    "q05_region_volume",
    "text_tfidf_topk",
    # round 4 wave 5 — returned-item report, containment near-dup
    "q10_returned_revenue",
    "dedup_containment",
    # round 4 wave 6 — pushdown showcase, promo-share dim join
    "q06_forecast_revenue",
    "q14_promo_revenue",
    # round 4 wave 7 — semi-join EXISTS, outer-join distribution,
    # disjunctive-predicate pushdown, PSI drift monitor
    "q04_priority_exists",
    "q13_order_distribution",
    "q19_disjunctive_revenue",
    "curation_drift_psi",
    # round 4 wave 8 — decorrelated scalar subquery, HAVING semi
    # carrier, argmax-with-ties
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q15_top_supplier",
    # round 4 wave 9 — anti-join + exact scalar threshold, the
    # single-scan Q21 rewrite, grouped-vs-global concentration
    "q22_idle_balance",
    "q21_sole_late_supplier",
    "q11_value_concentration",
    # round 4 wave 10 — HLL registers, struct-max argmax, CUBE rollup
    "sketch_hll_distinct",
    "curation_argmax_doc",
    "olap_cube_counts",
    # round 4 wave 11 — threshold semi join, integer z-test anomalies,
    # nearest-centroid eval
    "q20_dominant_supplier",
    "w9_anomaly_days",
    "emb_centroid_eval",
    # round 4 wave 12 — deepest dim-chain share join, PMI collocations
    "q08_market_share",
    "text_pmi_pairs",
    # round 4 wave 13 — grouped OLS trend, lag-window change capture,
    # histogram-driven Pareto deciles
    "w10_trend_slope",
    "w11_transitions",
    "curation_pareto",
    # round 4 wave 14 — order-independent corpus checksum
    "curation_checksum",
    # round 4 wave 15 — MERGE INTO snapshot apply
    "curation_merge_upsert",
    # round 4 wave 16 — argmin-per-group detail, two-way conditional
    "q02_first_supplier",
    "q12_priority_by_lateness",
    # round 4 wave 17 — bi-nation matrix, widest profit rollup,
    # NOT-IN variety count (completes the 22 TPC-H query shapes)
    "q07_bination_volume",
    "q09_profit_by_nation_year",
    "q16_supplier_variety",
    # round 4 wave 18 — Markov matrix, column-profiling report,
    # salted two-phase distinct
    "w12_transition_matrix",
    "curation_profile",
    "skew_salted_distinct",
]


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
    try:
        src.repartition(8).write.mode("overwrite").parquet(tmp + "/in")
        t0 = time.perf_counter()
        stream = SD.stream_documents(spark, tmp + "/in",
                                     max_files_per_trigger=2)
        kept = SD.stream_dedup_exact(stream)
        q = (kept.writeStream.format("noop")
             .option("checkpointLocation", tmp + "/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


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
    # one-shot streaming micro-bench (its own checkpoint each run, so
    # min-of-2 double-counts listing; a single availableNow drain is
    # the steady-state shape)
    timings["streaming_dedup_ingest"] = bench_streaming_dedup(spark, sf_dir)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # full per-query map: one human line each + a committed detail file
    for name, dt in timings.items():
        print(f"# {name}: {dt}")
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump({"metric": "headline_total_sec", "value": total,
                   "unit": "sec", "sf": sf_val, "n_queries": len(timings),
                   "queries": timings}, fh, indent=1, sort_keys=True)
    # final machine line LAST and SHORT (driver tail-captures stdout):
    # total + count + sf + only the 5 slowest queries inline
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(json.dumps({
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "sf": sf_val,
        "n_queries": len(timings),
        "detail": "BENCH_DETAIL.json",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
