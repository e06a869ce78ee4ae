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
    # unverified in r02 (registry positions 51-59)
    "mm_payload_stats", "mm_features", "dedup_components",
    "text_token_count_bpe", "text_repetition", "text_bm25_topk",
    "text_pii_scrub", "text_contamination", "curation_funnel",
    # new or changed in r03
    "r2_focal_all", "r3_fill_all", "sigma_a_brute", "sigma_a_hugonnet",
    "w2_positional_pick", "dedup_jaccard", "so_mask_algebra",
    "curation_sample_mix", "curation_train_order", "curation_pack_chunks",
    "sketch_kmv_distinct", "text_vocab_topk", "emb_quantize_stats",
    "sim_lsh_topk", "w4_sessionize", "j10_asof_join",
    "text_dup_ngrams", "text_chunk_windows", "curation_domain_weights",
    "curation_quality_prune", "dedup_incremental",
    "curation_weighted_sample", "emb_label_centroids",
    "text_perplexity",
]
_ROTATE_OUT = ["a8_rms", "a16_sym_bounds", "sc4_json_extract",
               "f5_valid_filter", "so2_anti_join", "f1_drop_noise",
               "a6_median_bias", "a14_closed_form", "a15_param_percentiles",
               "f6_percentile_clip", "sc_scalar_pack", "sc6_gps_dates",
               "sc2_catalog_parse", "so3_full_outer", "a5_mean_variogram",
               "a1_describe_events", "a7_bootstrap_median", "f2_keep_ground",
               "q01_pricing_summary", "text_fingerprint",
               "text_token_stats", "text_quality", "sim_cosine_topk",
               # rows-only (no SQL oracle possible): takes next round's
               # weak check, never displaces a hash-checked query
               "sim_semantic_dedup"]

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
