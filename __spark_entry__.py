"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in error_analysis_spark/plans/ (one module per operator
family, SURVEY.md §2); this file only merges the registries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from error_analysis_spark.plans.queries_core import CORE_QUERIES  # noqa: E402
from error_analysis_spark.plans.queries_ext import EXT_QUERIES  # noqa: E402
from error_analysis_spark.plans.queries_misc import MISC_QUERIES  # noqa: E402
from error_analysis_spark.plans.queries_raster import RASTER_QUERIES  # noqa: E402
from error_analysis_spark.plans.queries_vario import VARIO_QUERIES  # noqa: E402

_MERGED: dict[str, tuple] = {}
_MERGED.update(CORE_QUERIES)
_MERGED.update(VARIO_QUERIES)
_MERGED.update(RASTER_QUERIES)
_MERGED.update(MISC_QUERIES)
_MERGED.update(EXT_QUERIES)

# The driver oracle-checks the FIRST 50 declared queries, so declaration
# order is a verification budget. Policy (COVERAGE.md "verification
# rotation"): (1) queries with no green CORRECTNESS row last round come
# first, (2) then queries new or changed this round, (3) then the stable
# body; the explicit _ROTATE_OUT tail (only long-stable greens) is named
# in COVERAGE.md as next round's re-verification set.
_FRONT = [
    # round-3 rotate-out returns (unverified in r03 — re-verify now)
    "a8_rms", "a16_sym_bounds", "sc4_json_extract",
    "f5_valid_filter", "so2_anti_join", "f1_drop_noise",
    "a6_median_bias", "a14_closed_form", "a15_param_percentiles",
    "f6_percentile_clip", "sc_scalar_pack", "sc6_gps_dates",
    "sc2_catalog_parse", "so3_full_outer", "a5_mean_variogram",
    "a1_describe_events", "a7_bootstrap_median", "f2_keep_ground",
    "q01_pricing_summary", "text_fingerprint",
    "text_token_stats", "text_quality", "sim_cosine_topk",
    "sim_semantic_dedup",  # rows-only weak check, deferred from r03
    # new in r04
    "text_normalize", "text_oov_rate", "text_contam_bloom",
    "curation_domain_cap", "w5_rolling_stats", "sketch_grouped_quantiles",
    "q03_top_orders",
    # new in r04 wave 2
    "curation_split", "curation_length_buckets", "sketch_cms_err",
    "emb_random_projection", "curation_snapshot_diff", "w6_outlier_mad",
    # new in r04 wave 3
    "text_bigram_ppl", "emb_covariance", "curation_data_card",
    "w7_funnel", "w8_retention",
    # new in r04 wave 4
    "q05_region_volume", "text_tfidf_topk",
    # new in r04 wave 5
    "q10_returned_revenue", "dedup_containment",
    # new in r04 wave 6
    "q06_forecast_revenue", "q14_promo_revenue",
    # changed in r04 (eager pair cache / oracle NULL-quality parity)
    "dedup_jaccard", "curation_quality_prune",
]
# r04 waves 7+ land AFTER the window: every front slot is held by an
# r03-unverified return or an earlier r04 query, and the policy forbids
# bumping those. The merge loop below places them at positions 51+ —
# first in the r05 window — and the full declared set is locally
# oracle-verified per-commit by tests/test_oracle.py under the driver's
# own compare semantics, so they ship with a local green, not no
# signal. The explicit roster (pinned by test_registry_window_policy so
# nothing lands outside the window unplanned):
_POST_WINDOW_NEW = [
    "q04_priority_exists", "q13_order_distribution",
    "q19_disjunctive_revenue", "curation_drift_psi",
    "q17_small_qty_revenue", "q18_large_orders", "q15_top_supplier",
    "q22_idle_balance", "q21_sole_late_supplier",
    "q11_value_concentration", "sketch_hll_distinct",
    "curation_argmax_doc", "olap_cube_counts", "q20_dominant_supplier",
    "w9_anomaly_days", "emb_centroid_eval", "q08_market_share",
    "text_pmi_pairs", "w10_trend_slope", "w11_transitions",
    "curation_pareto", "curation_checksum", "curation_merge_upsert",
    "q02_first_supplier", "q12_priority_by_lateness",
    "q07_bination_volume", "q09_profit_by_nation_year",
    "q16_supplier_variety", "w12_transition_matrix", "curation_profile",
    "skew_salted_distinct",
]
# Only queries with >=2 lifetime green rows rotate out, plus five
# single-green queries whose plans are pure expression/aggregate
# pipelines unchanged since their green (pii regexp, quantize
# expressions, chunk windows narrow fan-out, KMV rank, as-of window);
# the rest of the r03 wave stays in-window to earn a second green.
_ROTATE_OUT = ["a2_zonal_stats", "w2_positional_pick", "j4_variogram_bins",
               "s8_grid_max", "s8_grid_idw", "r7_polygonize", "j1_r4_dod",
               "sigma_a_zones", "a13_zone_pixel_counts", "sc16_utm_roundtrip",
               "r1_geoid_shift", "dedup_exact", "dedup_minhash_sigs",
               "text_lang_id", "dedup_simhash", "dedup_minhash_lsh",
               "sim_pairwise_topk", "dedup_embedding", "mm_payload_stats",
               "mm_features", "dedup_components", "text_token_count_bpe",
               "curation_funnel",
               "text_pii_scrub", "emb_quantize_stats", "text_chunk_windows",
               "sketch_kmv_distinct", "j10_asof_join",
               "curation_domain_weights", "text_contamination",
               "text_vocab_topk",
               # r04 wave-2 makes room: single-green r03 queries whose
               # plans are unchanged since their green (seeded-kernel
               # uncertainty estimators, native session_window, the
               # map-side sampler and the two bucket-scan queries)
               "sigma_a_brute", "sigma_a_hugonnet", "w4_sessionize",
               "curation_sample_mix", "curation_train_order",
               "curation_pack_chunks",
               # r04 wave-3 makes room: single-green r03 queries with
               # unchanged plans (fused repetition aggregate, BM25
               # top-k, the persisted-index incremental dedup, A-ES
               # sampler, label centroids)
               "text_repetition", "text_bm25_topk", "dedup_incremental",
               "curation_weighted_sample", "emb_label_centroids",
               # r04 wave-4 makes room (single-green r03, plans
               # unchanged: gram-hash rollup, token-shipping rewrite)
               "text_dup_ngrams", "text_perplexity",
               # r04 wave-5 makes room (consolidated r03-green mask
               # algebra, sim_lsh_topk unchanged since its r03 fix)
               "so_mask_algebra", "sim_lsh_topk",
               # r04 wave-6 makes room (consolidated r03-green focal
               # and fill families, plans unchanged since their green)
               "r2_focal_all", "r3_fill_all"]

_ALL: dict[str, tuple] = {}
for _n in _FRONT:
    _ALL[_n] = _MERGED[_n]
for _n in _MERGED:
    if _n not in _ALL and _n not in _ROTATE_OUT:
        _ALL[_n] = _MERGED[_n]
for _n in _ROTATE_OUT:
    _ALL[_n] = _MERGED[_n]
assert len(_ALL) == len(_MERGED), "registry reorder dropped a query"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    j1_r4_dod is the engine's raison d'être: align (regrid + pair join)
    → difference → median-bias subtract → zonal stats in one lazy DAG
    (notebook cells [60]-[74])."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fn, _ = _ALL["j1_r4_dod"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out = {}
    for name, (fn, _sql) in _ALL.items():
        def wrapped(spark, sf_dir, _fn=fn):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column aliases)."""
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
