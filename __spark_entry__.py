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
from error_analysis_spark.plans.queries_packs import (  # noqa: E402
    PACK_QUERIES, PACKED_MEMBERS)
from error_analysis_spark.plans.queries_raster import RASTER_QUERIES  # noqa: E402
from error_analysis_spark.plans.queries_vario import VARIO_QUERIES  # noqa: E402

_MERGED: dict[str, tuple] = {}
_MERGED.update(CORE_QUERIES)
_MERGED.update(VARIO_QUERIES)
_MERGED.update(RASTER_QUERIES)
_MERGED.update(MISC_QUERIES)
_MERGED.update(EXT_QUERIES)
# consolidation (round 5, VERDICT r4 #3): families of single queries
# fuse into packs whose value hash covers every member's full result;
# members keep their functions/tests but leave the DECLARED registry
for _m in PACKED_MEMBERS:
    del _MERGED[_m]
_MERGED.update(PACK_QUERIES)

# The driver oracle-checks the FIRST 50 declared queries, so declaration
# order is a verification budget. Policy (COVERAGE.md "verification
# rotation"): (1) queries with no green CORRECTNESS row last round come
# first, (2) then queries new or changed this round, (3) then the stable
# body; the explicit _ROTATE_OUT tail (only long-stable greens) is named
# in COVERAGE.md as next round's re-verification set.
_FRONT = [
    # r06's one post-window query (local test_oracle green only), ALSO
    # changed this round: the id-domain contract fix (docs with no
    # countable line survive with empty text) + the one-tokenization
    # pin — driver-green it first
    "text_line_dedup",
    # new in r07: the E3 chain with the reference's canonical
    # multi-run variography (R6 ×n via the lazy md5 sampler + the A5
    # cross-run reduce), full oracle incl. selection parity
    "pipeline_chain_multi",
    # the r06 rotate-out tail (r05 greens, unverified in r06 per the
    # documented window policy) — re-verify all 48 now. NOTES:
    # (a) j4_variogram_bins is in this tail AND changed in r06
    # (DECIMAL SSD rounding, 685bb48) — its r05 green predates that
    # change (ADVICE r06), so its re-verification here is overdue,
    # not merely rotational. (b) dedup_sig_pack is in this tail AND
    # changed in r07 (new member dedup_simhash_pairs — the banded
    # Hamming-radius search, folded into the pack so the new operator
    # earns a driver green THIS round without costing a window slot).
    "curation_drift_psi", "sketch_hll_distinct", "curation_argmax_doc",
    "olap_cube_counts", "w9_anomaly_days", "emb_centroid_eval",
    "text_pmi_pairs", "w10_trend_slope", "w11_transitions",
    "curation_pareto", "curation_checksum", "curation_merge_upsert",
    "w12_transition_matrix", "curation_profile", "skew_salted_distinct",
    "tpch_agg_pack", "tpch_join_pack", "tpch_subq_pack",
    "text_doc_pack", "s8_grid_pack", "dedup_sig_pack",
    "mixing_pack", "contam_chunk_pack", "sigma_a_pack", "sim_pair_pack",
    "dedup_cluster_pack", "text_sketch_pack", "emb_pack",
    "temporal_pack",
    "sim_semantic_dedup", "dedup_jaccard", "dedup_containment",
    "a2_zonal_stats", "w2_positional_pick", "j4_variogram_bins",
    "r7_polygonize", "j1_r4_dod", "a13_zone_pixel_counts",
    "sc16_utm_roundtrip", "r1_geoid_shift",
    "curation_domain_weights", "curation_weighted_sample",
    "curation_funnel",
    "text_bm25_topk", "so_mask_algebra", "r2_focal_all", "r3_fill_all",
    "ingest_csv_quarantine",
]
# Round 7 declares nothing past the window: the 50 slots hold the one
# r06 post-window query (also changed), 1 new chain, and the 48-name
# r06 rotate-out tail exactly (1 + 1 + 48 = 50).
_POST_WINDOW_NEW: list[str] = []
# The rotate-out tail: exactly the r06-green window queries that are
# unchanged this round (every one carries a green CORRECTNESS_r06 row,
# so no query goes unverified two rounds running). They are next
# round's re-verification set.
_ROTATE_OUT = [
    "j11_interval_join", "layout_zorder", "curation_delta_agg",
    "text_bpe_merges", "text_domain_topk", "emb_hard_triplets",
    "pipeline_chain", "mm_pack", "ingest_compaction",
    "a8_rms", "a16_sym_bounds", "sc4_json_extract", "f5_valid_filter",
    "so2_anti_join", "f1_drop_noise", "a6_median_bias",
    "a14_closed_form", "a15_param_percentiles", "f6_percentile_clip",
    "sc_scalar_pack", "sc6_gps_dates", "sc2_catalog_parse",
    "so3_full_outer", "a5_mean_variogram", "a1_describe_events",
    "a7_bootstrap_median", "f2_keep_ground", "text_fingerprint",
    "text_token_stats", "text_quality", "sim_cosine_topk",
    "text_normalize", "text_oov_rate", "text_contam_bloom",
    "curation_domain_cap", "w5_rolling_stats",
    "sketch_grouped_quantiles", "curation_split",
    "curation_length_buckets", "sketch_cms_err",
    "emb_random_projection", "curation_snapshot_diff", "w6_outlier_mad",
    "text_bigram_ppl", "emb_covariance", "curation_data_card",
    "w7_funnel", "w8_retention", "text_tfidf_topk",
    "curation_quality_prune",
]

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
    """One entry per implemented query family from SURVEY.md §2."""
    from error_analysis_spark import cachereg as _cachereg

    out = {}
    for name, (fn, _sql) in _ALL.items():
        def wrapped(spark, sf_dir, _fn=fn):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # harness-level conf pin (not per-query mutation): every
            # timestamp query assumes UTC
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # release caches pinned by the PREVIOUS query (dedup pair
            # lists, the chain's DoD reuse cache, …) so a long-lived
            # session (driver's query loop, bench) never accumulates
            # persisted results (ADVICE r05)
            _cachereg.release_tracked()
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column aliases)."""
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
